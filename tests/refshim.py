"""Load the reference's own torch modules for in-the-loop parity tests.

The reference (/root/reference, PyTorch) is imported as-is so its *running
code* — not re-derived equations — is the oracle for the JAX stack.  Only
`vibevoice/schedule/dpm_solver.py` needs `diffusers`, which is not installed
here; `install_diffusers_shim` registers a minimal fake with exactly the
surface that file imports (reference dpm_solver.py:23-26):

  * ConfigMixin / register_to_config  — stores init kwargs on `self.config`
  * deprecate                         — no-op
  * randn_tensor                      — torch.randn (+ injection hook so
                                        parity tests can feed both stacks
                                        identical SDE noise)
  * KarrasDiffusionSchedulers / SchedulerMixin / SchedulerOutput

Nothing here is imported by the package — test-only infrastructure.
"""

from __future__ import annotations

import functools
import inspect
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

#: Tests may set this to a callable `(shape) -> torch.Tensor` to inject
#: deterministic noise into the reference scheduler's SDE path.
NOISE_HOOK = None


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "vibevoice"))


def install_diffusers_shim() -> None:
    if "diffusers" in sys.modules:
        return
    import enum

    import torch

    class FrozenDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name) from None

    class ConfigMixin:
        @property
        def config(self):
            return self._internal_dict

        def register_to_config(self, **kwargs):
            d = dict(getattr(self, "_internal_dict", {}))
            d.update(kwargs)
            self._internal_dict = FrozenDict(d)

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {
                k: v for k, v in bound.arguments.items()
                if k != "self" and sig.parameters[k].kind not in (
                    inspect.Parameter.VAR_KEYWORD,
                    inspect.Parameter.VAR_POSITIONAL)
            }
            self._internal_dict = FrozenDict(cfg)
            init(self, *args, **kwargs)

        return wrapper

    def deprecate(*args, **kwargs):
        return None

    def randn_tensor(shape, generator=None, device=None, dtype=None,
                     layout=None):
        if NOISE_HOOK is not None:
            t = NOISE_HOOK(tuple(shape))
            return t.to(device=device, dtype=dtype or t.dtype)
        return torch.randn(tuple(shape), generator=generator, device=device,
                           dtype=dtype)

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    class KarrasDiffusionSchedulers(enum.Enum):
        DPMSolverMultistepScheduler = 1

    diffusers = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    utils_mod = types.ModuleType("diffusers.utils")
    utils_mod.deprecate = deprecate
    torch_utils_mod = types.ModuleType("diffusers.utils.torch_utils")
    torch_utils_mod.randn_tensor = randn_tensor
    utils_mod.torch_utils = torch_utils_mod
    scheds_mod = types.ModuleType("diffusers.schedulers")
    sched_utils_mod = types.ModuleType("diffusers.schedulers.scheduling_utils")
    sched_utils_mod.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_utils_mod.SchedulerMixin = SchedulerMixin
    sched_utils_mod.SchedulerOutput = SchedulerOutput
    scheds_mod.scheduling_utils = sched_utils_mod

    diffusers.configuration_utils = cfg_mod
    diffusers.utils = utils_mod
    diffusers.schedulers = scheds_mod
    diffusers._is_vibevoice_tpu_test_shim = True

    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cfg_mod
    sys.modules["diffusers.utils"] = utils_mod
    sys.modules["diffusers.utils.torch_utils"] = torch_utils_mod
    sys.modules["diffusers.schedulers"] = scheds_mod
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils_mod


def _patch_transformers_compat():
    """The reference targets transformers 4.51; this env ships 4.57, which
    dropped the trailing ``device`` parameter of
    ``GenerationMixin._prepare_cache_for_generation``
    (reference modeling_vibevoice_inference.py:303 passes it positionally).
    Wrap the method to tolerate the legacy extra argument — no behavior
    change on either version."""
    import inspect

    from transformers.generation.utils import GenerationMixin

    orig = GenerationMixin._prepare_cache_for_generation
    if "device" in inspect.signature(orig).parameters:
        return

    @functools.wraps(orig)
    def patched(self, generation_config, model_kwargs, generation_mode,
                batch_size, max_cache_length, device=None):
        return orig(self, generation_config, model_kwargs, generation_mode,
                    batch_size, max_cache_length)

    GenerationMixin._prepare_cache_for_generation = patched

    # 4.57 restructured DynamicCache from parallel key_cache/value_cache
    # lists to a `layers` list; the reference's per-sample cache surgery
    # (modeling_vibevoice_inference.py:546-563, 588-622) indexes the old
    # attributes.  Expose them as views of the live layer tensors (the
    # surgery mutates slices in place, so views suffice).
    from transformers.cache_utils import DynamicCache

    if not hasattr(DynamicCache, "key_cache"):
        # pre-update layers have keys=None in 4.57; 4.51 exposed an empty
        # list until the first update — preserve that
        DynamicCache.key_cache = property(
            lambda self: [l.keys for l in self.layers if l.keys is not None])
        DynamicCache.value_cache = property(
            lambda self: [l.values for l in self.layers if l.values is not None])


_ns = None


def load_reference():
    """Import the reference modules once; returns a namespace object."""
    global _ns
    if _ns is not None:
        return _ns
    install_diffusers_shim()
    _patch_transformers_compat()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import vibevoice.modular.configuration_vibevoice as configuration
    import vibevoice.modular.modular_vibevoice_diffusion_head as head
    import vibevoice.modular.modular_vibevoice_tokenizer as tokenizer
    import vibevoice.schedule.dpm_solver as dpm_solver

    ns = types.SimpleNamespace(
        configuration=configuration,
        tokenizer=tokenizer,
        head=head,
        dpm_solver=dpm_solver,
    )
    # The composite model needs transformers' Qwen2 via AutoModel; import it
    # lazily so tokenizer/head/solver parity still runs if it ever breaks.
    try:
        import vibevoice.modular.modeling_vibevoice as modeling
        ns.modeling = modeling
    except Exception as e:  # pragma: no cover - environment-specific
        ns.modeling = None
        ns.modeling_error = repr(e)
    try:
        import vibevoice.modular.modeling_vibevoice_inference as inference
        ns.inference = inference
    except Exception as e:  # pragma: no cover
        ns.inference = None
        ns.inference_error = repr(e)
    _ns = ns
    return ns


def torch_subtree(np_state_dict: dict, prefix: str) -> dict:
    """Slice a reference-named numpy state dict to a torch state dict for a
    standalone module rooted at `prefix` (e.g. 'model.acoustic_tokenizer.')."""
    import numpy as np
    import torch

    return {
        k[len(prefix):]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in np_state_dict.items() if k.startswith(prefix)
    }
