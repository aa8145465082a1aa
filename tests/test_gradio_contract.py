"""De-circularized UI validation (VERDICT r2 weak #1 / next #5).

The vendored stub alone can't catch the app calling gradio wrongly (it was
written to mirror the app).  These tests pin three independent directions
against the COMMITTED contract (apps/gradio_contract.py — real gradio's
public surface for the symbols used):

  1. every component the app constructs passes only contract kwargs, and
     every event it wires is a contract event;
  2. the stub's public surface equals the contract's symbol set, and the
     stub does not define event methods beyond the contract (drift in
     either direction fails);
  3. a golden snapshot of the full component tree (class, label) — layout
     regressions are visible in review instead of silent;
  4. the serve-time launch()/queue() kwargs in the app SOURCE are contract
     kwargs (those calls don't execute under --check);
  5. if real gradio is importable, the contract itself is validated against
     inspect.signature of the real classes.
"""

import inspect
import json
import os
import re

import pytest

from vibevoice_tpu.apps import gradio_contract as contract

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "gradio_tree.json")


@pytest.fixture(scope="module")
def ui(tmp_path_factory):
    from vibevoice_tpu.apps import gradio_app
    from vibevoice_tpu.apps.gradio_app import VibeVoiceDemo

    tmp = tmp_path_factory.mktemp("ui")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        os.makedirs("examples/text_examples", exist_ok=True)
        with open("examples/text_examples/2p_test.txt", "w") as f:
            f.write("Speaker 1: hi\nSpeaker 2: hello\n")
        demo = VibeVoiceDemo(load_on_demand=True)
        return gradio_app.build_ui_headless(demo)
    finally:
        os.chdir(cwd)


def test_app_calls_stay_inside_contract(ui):
    for comp in ui.components:
        cls = type(comp).__name__
        assert cls in contract.COMPONENT_KWARGS, f"uncontracted component {cls}"
        allowed = contract.COMPONENT_KWARGS[cls]
        used = set(comp.kwargs)
        assert used <= allowed, (cls, sorted(used - allowed))
        n_pos = len(getattr(comp, "args", ()))
        assert n_pos <= len(contract.COMPONENT_POSITIONAL[cls]) + 1, \
            (cls, n_pos)  # +1: stub base may record a positional default
        for event, fn, inputs, outputs in comp.events:
            assert event in contract.EVENT_METHODS, (cls, event)
            assert callable(fn)


def test_stub_surface_equals_contract():
    """Drift check in BOTH directions: symbols the contract lists exist in
    the stub; the stub exposes no extra component classes or event methods
    the contract doesn't know (an extra would silently absorb app bugs)."""
    from vibevoice_tpu.apps import gradio_stub as stub

    contracted = set(contract.COMPONENT_KWARGS)
    stub_components = {
        name for name, obj in vars(stub).items()
        if inspect.isclass(obj) and not name.startswith("_")
        and issubclass(obj, stub.Component)
    } - {"Component"}
    assert stub_components == contracted, (
        sorted(stub_components ^ contracted))

    event_methods = {
        n for n, m in vars(stub.Component).items()
        if callable(m) and not n.startswith("_")
    }
    assert event_methods <= contract.EVENT_METHODS, event_methods

    for fn in contract.MODULE_FUNCTIONS:
        assert callable(getattr(stub, fn)), fn
    for theme in contract.THEMES:
        assert callable(getattr(stub.themes, theme)), theme


def test_component_tree_matches_golden(ui):
    tree = [[type(c).__name__, c.label] for c in ui.components]
    if not os.path.exists(GOLDEN):  # first run: write, then fail to review
        with open(GOLDEN, "w") as f:
            json.dump(tree, f, indent=1)
        pytest.fail(f"golden written to {GOLDEN}; review and re-run")
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert tree == golden, "UI component tree changed — update the golden " \
                           "after reviewing the layout diff"


def test_serve_time_kwargs_in_contract():
    import vibevoice_tpu.apps.gradio_app as app_mod
    import vibevoice_tpu.apps.gradio_demo as demo_mod

    for mod in (app_mod, demo_mod):
        src = inspect.getsource(mod)
        for meth, allowed in (("launch", contract.LAUNCH_KWARGS),
                              ("queue", contract.QUEUE_KWARGS)):
            for m in re.finditer(r"\.%s\(" % meth, src):
                i, depth, buf = m.end(), 1, ""
                while depth and i < len(src):
                    c = src[i]
                    depth += c == "("
                    depth -= c == ")"
                    if depth:
                        buf += c
                    i += 1
                used = set(re.findall(r"(\w+)\s*=(?!=)", buf))
                assert used <= allowed, (mod.__name__, meth,
                                         sorted(used - allowed))


def test_contract_against_real_gradio_if_installed():
    gradio = pytest.importorskip("gradio")
    for cls, kwargs in contract.COMPONENT_KWARGS.items():
        real = getattr(gradio, cls)
        sig = inspect.signature(real.__init__)
        params = set(sig.parameters)
        if any(p.kind == inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values()):
            continue
        missing = kwargs - params
        assert not missing, (cls, sorted(missing))
