"""DPM-Solver / DPM-Solver++ as pure functions over precomputed coefficients.

TPU-first redesign of the reference's stateful ``DPMSolverMultistepScheduler``
(reference: vibevoice/schedule/dpm_solver.py:122-1022).  The reference mutates a
step counter and a ring of past model outputs inside ``step()``; under XLA that
state machine becomes: precompute *every* per-step scalar coefficient in float64
numpy once per (num_inference_steps, config), then run the sampling loop as a
``jax.lax.scan`` whose carry is ``(x, prev_model_output)``.  All data-dependent
branching (first/second order selection, final-step handling) is folded into the
precomputed coefficient arrays, so the scanned step is straight-line arithmetic
plus the denoiser call — exactly what the MXU/VPU want.

Supported (matching what the reference actually exercises, and more):
  * algorithms: ``dpmsolver++``, ``sde-dpmsolver++``, ``dpmsolver``, ``sde-dpmsolver``
  * solver orders 1 and 2 (``midpoint`` and ``heun``) — the reference default is
    order 2 midpoint (dpm_solver.py:210,216); demos use sde-dpmsolver++
    (demo/gradio_demo.py:173-179, main.py:543-548)
  * beta schedules: linear, scaled_linear, cosine/squaredcos_cap_v2, cauchy,
    laplace, exp (dpm_solver.py:51-76, 232-247)
  * prediction types: epsilon, sample, v_prediction (dpm_solver.py:571-625)
  * timestep spacing: linspace/leading/trailing; Karras & Lu-lambda sigmas
  * ``lower_order_final`` / ``final_sigmas_type`` semantics (dpm_solver.py:977-985)
  * ``add_noise`` / ``get_velocity`` for training (dpm_solver.py:1024-1062)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------

def _alpha_bar_fn(transform: str) -> Callable[[float], float]:
    if transform == "cosine":
        return lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    if transform == "exp":
        return lambda t: math.exp(t * -12.0)
    if transform == "cauchy":
        def fn(t, gamma=1.0, mu=3.0):
            snr = mu + gamma * math.tan(math.pi * (0.5 - t) * 0.9)
            return 1 - 1 / (math.exp(snr) + 1.1)
        return fn
    if transform == "laplace":
        def fn(t, mu=0.0, b=1.0):
            snr = mu - b * math.copysign(1, 0.5 - t) * math.log(1 - 2 * abs(t - 0.5) * 0.98)
            return 1 - 1 / (math.exp(snr) + 1.02)
        return fn
    raise ValueError(f"Unsupported alpha transform: {transform}")


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999, transform: str = "cosine") -> np.ndarray:
    fn = _alpha_bar_fn(transform)
    t = np.arange(num_steps, dtype=np.float64)
    t1 = t / num_steps
    t2 = (t + 1) / num_steps
    a1 = np.array([fn(x) for x in t1])
    a2 = np.array([fn(x) for x in t2])
    return np.minimum(1 - a2 / a1, max_beta)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (arXiv:2305.08891 alg. 1)."""
    alphas = 1.0 - betas
    abar_sqrt = np.sqrt(np.cumprod(alphas))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt ** 2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1 - alphas


def make_betas(beta_schedule: str, num_train_timesteps: int,
               beta_start: float = 1e-4, beta_end: float = 0.02,
               rescale_zero_snr: bool = False) -> np.ndarray:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule in ("squaredcos_cap_v2", "cosine"):
        betas = betas_for_alpha_bar(num_train_timesteps, transform="cosine")
    elif beta_schedule in ("cauchy", "laplace", "exp"):
        betas = betas_for_alpha_bar(num_train_timesteps, transform=beta_schedule)
    else:
        raise NotImplementedError(f"beta schedule {beta_schedule}")
    if rescale_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    return betas


def make_alphas_cumprod(beta_schedule: str, num_train_timesteps: int, **kw) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(beta_schedule, num_train_timesteps, **kw))


# ---------------------------------------------------------------------------
# Solver configuration + precomputed schedule
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DPMSolverConfig:
    num_train_timesteps: int = 1000
    beta_schedule: str = "cosine"
    prediction_type: str = "v_prediction"
    algorithm_type: str = "dpmsolver++"
    solver_order: int = 2
    solver_type: str = "midpoint"  # 'midpoint' | 'heun'
    lower_order_final: bool = True
    euler_at_final: bool = False
    final_sigmas_type: str = "zero"  # 'zero' | 'sigma_min'
    timestep_spacing: str = "linspace"
    steps_offset: int = 0
    use_karras_sigmas: bool = False
    use_lu_lambdas: bool = False
    beta_start: float = 1e-4
    beta_end: float = 0.02
    rescale_betas_zero_snr: bool = False
    lambda_min_clipped: float = -float("inf")
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0

    @property
    def is_pp(self) -> bool:
        return self.algorithm_type in ("dpmsolver++", "sde-dpmsolver++")

    @property
    def is_sde(self) -> bool:
        return self.algorithm_type in ("sde-dpmsolver", "sde-dpmsolver++")


class DPMSolverSchedule(NamedTuple):
    """Per-run precomputed coefficients; every field is a length-S array.

    The scanned update is, for model output m_i (converted to x0/eps domain):
        D1_i   = inv_r0[i] * (m_i - m_{i-1})                  (0 on first-order steps)
        x_{i+1} = c_x[i]*x_i + c_d0[i]*m_i + c_d1[i]*D1_i + c_noise[i]*z_i
    with c_d1 zeroed on first-order steps.  On third-order steps (c_d2 != 0):
        D1 = D1_0 + w01[i]*(D1_0 - D1_1), D2 = inv_r01[i]*(D1_0 - D1_1)
        with D1_0 = inv_r0[i]*(m_i - m_{i-1}), D1_1 = inv_r1[i]*(m_{i-1} - m_{i-2})
        x_{i+1} = c_x[i]*x_i + c_d0[i]*m_i + c_d1[i]*D1 + c_d2[i]*D2
    Conversion of the raw network output:
        m_i = cvt_x[i]*x_i + cvt_m[i]*net(x_i, t_i, cond)
    """
    timesteps: jax.Array   # [S] float32, the t fed to the denoiser
    cvt_x: jax.Array       # [S]
    cvt_m: jax.Array       # [S]
    c_x: jax.Array         # [S]
    c_d0: jax.Array        # [S]
    c_d1: jax.Array        # [S]
    c_noise: jax.Array     # [S]
    inv_r0: jax.Array      # [S]
    c_d2: jax.Array        # [S] (order-3 only)
    inv_r1: jax.Array      # [S]
    w01: jax.Array         # [S] r0/(r0+r1)
    inv_r01: jax.Array     # [S] 1/(r0+r1)
    thresh: jax.Array      # [2]: (dynamic_thresholding_ratio, sample_max_value); ratio<0 -> off

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def _inference_timesteps(cfg: DPMSolverConfig, num_inference_steps: int,
                         lambdas_full: np.ndarray) -> np.ndarray:
    """Integer training-timestep grid for the run (dpm_solver.py:349-382)."""
    if cfg.lambda_min_clipped > -float("inf"):
        # index of first lambda (from the end) above the clip threshold
        clipped_idx = int(np.searchsorted(lambdas_full[::-1], cfg.lambda_min_clipped))
        last_timestep = cfg.num_train_timesteps - clipped_idx
    else:
        last_timestep = cfg.num_train_timesteps

    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, last_timestep - 1, num_inference_steps + 1).round()[::-1][:-1]
    elif cfg.timestep_spacing == "leading":
        step_ratio = last_timestep // (num_inference_steps + 1)
        ts = (np.arange(0, num_inference_steps + 1) * step_ratio).round()[::-1][:-1]
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = cfg.num_train_timesteps / num_inference_steps
        ts = np.arange(last_timestep, 0, -step_ratio).round() - 1
    else:
        raise ValueError(f"timestep_spacing {cfg.timestep_spacing}")
    return ts.astype(np.int64)


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


def make_schedule(cfg: DPMSolverConfig, num_inference_steps: int,
                  dtype=jnp.float32) -> DPMSolverSchedule:
    """Precompute all per-step solver coefficients (float64 numpy → device arrays)."""
    abar = make_alphas_cumprod(cfg.beta_schedule, cfg.num_train_timesteps,
                               beta_start=cfg.beta_start, beta_end=cfg.beta_end,
                               rescale_zero_snr=cfg.rescale_betas_zero_snr)
    if cfg.rescale_betas_zero_snr:
        abar[-1] = 2 ** -24
    sigmas_full = np.sqrt((1 - abar) / abar)          # karras-style sigma(t)
    lambdas_full = -np.log(sigmas_full)                # log(alpha/sigma) = -log sigma (VP)

    if cfg.use_karras_sigmas:
        smin, smax = sigmas_full[0], sigmas_full[-1]
        rho = 7.0
        ramp = np.linspace(0, 1, num_inference_steps)
        sigmas = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        timesteps = _sigma_to_t(sigmas, np.log(sigmas_full)).round()
    elif cfg.use_lu_lambdas:
        lmin, lmax = np.log(sigmas_full)[-1], np.log(sigmas_full)[0]
        # note: reference interpolates log-sigmas linearly with rho=1
        ramp = np.linspace(0, 1, num_inference_steps)
        lambdas = lmax + ramp * (lmin - lmax)
        sigmas = np.exp(lambdas)
        timesteps = _sigma_to_t(sigmas, np.log(sigmas_full)).round()
    else:
        timesteps = _inference_timesteps(cfg, num_inference_steps, lambdas_full)
        sigmas = np.interp(timesteps, np.arange(len(sigmas_full)), sigmas_full)

    if cfg.final_sigmas_type == "sigma_min":
        sigma_last = sigmas_full[0]
    elif cfg.final_sigmas_type == "zero":
        sigma_last = 0.0
    else:
        raise ValueError(cfg.final_sigmas_type)
    sigmas = np.concatenate([sigmas, [sigma_last]])   # [S+1]

    S = len(timesteps)
    with np.errstate(divide="ignore", over="ignore"):
        alpha = 1.0 / np.sqrt(sigmas ** 2 + 1)        # alpha_t
        sig = sigmas * alpha                          # sigma_t (VP parametrization)
        lam = np.log(np.maximum(alpha, 1e-300)) - np.log(np.maximum(sig, 1e-300))

    cvt_x = np.zeros(S)
    cvt_m = np.zeros(S)
    for i in range(S):
        a_s, s_s = alpha[i], sig[i]
        if cfg.is_pp:  # convert to x0 prediction
            if cfg.prediction_type == "epsilon":
                cvt_x[i], cvt_m[i] = 1.0 / a_s, -s_s / a_s
            elif cfg.prediction_type == "sample":
                cvt_x[i], cvt_m[i] = 0.0, 1.0
            elif cfg.prediction_type == "v_prediction":
                cvt_x[i], cvt_m[i] = a_s, -s_s
            else:
                raise ValueError(cfg.prediction_type)
        else:  # convert to epsilon prediction
            if cfg.prediction_type == "epsilon":
                cvt_x[i], cvt_m[i] = 0.0, 1.0
            elif cfg.prediction_type == "sample":
                cvt_x[i], cvt_m[i] = 1.0 / s_s, -a_s / s_s
            elif cfg.prediction_type == "v_prediction":
                cvt_x[i], cvt_m[i] = s_s, a_s
            else:
                raise ValueError(cfg.prediction_type)

    c_x = np.zeros(S)
    c_d0 = np.zeros(S)
    c_d1 = np.zeros(S)
    c_noise = np.zeros(S)
    inv_r0 = np.zeros(S)
    c_d2 = np.zeros(S)
    inv_r1 = np.zeros(S)
    w01 = np.zeros(S)
    inv_r01 = np.zeros(S)

    for i in range(S):
        a_t, s_t = alpha[i + 1], sig[i + 1]
        a_s0, s_s0 = alpha[i], sig[i]
        h = lam[i + 1] - lam[i]                       # may be +inf at final zero-sigma step
        emh = np.exp(-h)                              # exp(-h); 0 when h = inf
        eh = np.exp(h) if np.isfinite(h) else np.inf

        # order selection, mirroring dpm_solver.py:977-1008: step 0 has no
        # history; the final step is forced to first order when euler_at_final,
        # lower_order_final with <15 steps, or final sigma zero; the penultimate
        # step is capped at 2nd order for order-3 runs.
        lower_order_final = (i == S - 1) and (
            cfg.euler_at_final or (cfg.lower_order_final and S < 15) or cfg.final_sigmas_type == "zero"
        )
        lower_order_second = (i == S - 2) and cfg.lower_order_final and S < 15
        use_first = (cfg.solver_order == 1) or (i == 0) or lower_order_final
        use_third = (cfg.solver_order == 3 and not use_first and i >= 2
                     and not lower_order_second)

        if use_third:
            if cfg.is_sde:
                raise NotImplementedError("order 3 is not defined for the SDE variants")
            h_0 = lam[i] - lam[i - 1]
            h_1 = lam[i - 1] - lam[i - 2]
            r0, r1 = h_0 / h, h_1 / h
            inv_r0[i] = 1.0 / r0
            inv_r1[i] = 1.0 / r1
            w01[i] = r0 / (r0 + r1)
            inv_r01[i] = 1.0 / (r0 + r1)
            if cfg.algorithm_type == "dpmsolver++":
                c_x[i] = s_t / s_s0
                c_d0[i] = -a_t * (emh - 1.0)
                c_d1[i] = a_t * ((emh - 1.0) / h + 1.0)
                c_d2[i] = -a_t * ((emh - 1.0 + h) / h ** 2 - 0.5)
            else:  # dpmsolver
                c_x[i] = a_t / a_s0
                c_d0[i] = -s_t * (eh - 1.0)
                c_d1[i] = -s_t * ((eh - 1.0) / h - 1.0)
                c_d2[i] = -s_t * ((eh - 1.0 - h) / h ** 2 - 0.5)
            continue

        if cfg.algorithm_type == "dpmsolver++":
            if use_first:
                c_x[i] = s_t / s_s0
                c_d0[i] = -a_t * (emh - 1.0)
            else:
                c_x[i] = s_t / s_s0
                c_d0[i] = -a_t * (emh - 1.0)
                if cfg.solver_type == "midpoint":
                    c_d1[i] = -0.5 * a_t * (emh - 1.0)
                else:  # heun
                    c_d1[i] = a_t * ((emh - 1.0) / h + 1.0)
        elif cfg.algorithm_type == "sde-dpmsolver++":
            em2h = np.exp(-2.0 * h)
            if use_first:
                c_x[i] = (s_t / s_s0) * emh
                c_d0[i] = a_t * (1 - em2h)
                c_noise[i] = s_t * np.sqrt(max(1.0 - em2h, 0.0))
            else:
                c_x[i] = (s_t / s_s0) * emh
                c_d0[i] = a_t * (1 - em2h)
                if cfg.solver_type == "midpoint":
                    c_d1[i] = 0.5 * a_t * (1 - em2h)
                else:
                    c_d1[i] = a_t * ((1.0 - em2h) / (-2.0 * h) + 1.0)
                c_noise[i] = s_t * np.sqrt(max(1.0 - em2h, 0.0))
        elif cfg.algorithm_type == "dpmsolver":
            if use_first:
                c_x[i] = a_t / a_s0
                c_d0[i] = -s_t * (eh - 1.0)
            else:
                c_x[i] = a_t / a_s0
                c_d0[i] = -s_t * (eh - 1.0)
                if cfg.solver_type == "midpoint":
                    c_d1[i] = -0.5 * s_t * (eh - 1.0)
                else:
                    c_d1[i] = -s_t * ((eh - 1.0) / h - 1.0)
        elif cfg.algorithm_type == "sde-dpmsolver":
            e2h = np.exp(2.0 * h) if np.isfinite(h) else np.inf
            if use_first:
                c_x[i] = a_t / a_s0
                c_d0[i] = -2.0 * s_t * (eh - 1.0)
                c_noise[i] = s_t * np.sqrt(max(e2h - 1.0, 0.0))
            else:
                c_x[i] = a_t / a_s0
                c_d0[i] = -2.0 * s_t * (eh - 1.0)
                if cfg.solver_type == "midpoint":
                    c_d1[i] = -s_t * (eh - 1.0)
                else:
                    c_d1[i] = -2.0 * s_t * ((eh - 1.0) / h - 1.0)
                c_noise[i] = s_t * np.sqrt(max(e2h - 1.0, 0.0))
        else:
            raise NotImplementedError(cfg.algorithm_type)

        if not use_first and i >= 1:
            h_0 = lam[i] - lam[i - 1]
            inv_r0[i] = h / h_0 if h_0 != 0 else 0.0   # D1 = (m0 - m1) / r0, r0 = h_0/h

    # host-side numpy, NOT jnp: these are closed over by the jitted step, and
    # device-resident closure constants force a device->host fetch per array
    # at trace time (~8 s each over a tunneled TPU — the round-1 "compile
    # time" was mostly this).  numpy constants embed for free.
    arr = lambda x: np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0).astype(dtype)
    thr_ratio = cfg.dynamic_thresholding_ratio if (cfg.thresholding and cfg.is_pp) else -1.0
    return DPMSolverSchedule(
        timesteps=np.asarray(timesteps, dtype=dtype),
        cvt_x=arr(cvt_x), cvt_m=arr(cvt_m),
        c_x=arr(c_x), c_d0=arr(c_d0), c_d1=arr(c_d1), c_noise=arr(c_noise),
        inv_r0=arr(inv_r0), c_d2=arr(c_d2), inv_r1=arr(inv_r1), w01=arr(w01),
        inv_r01=arr(inv_r01),
        thresh=np.asarray([thr_ratio, cfg.sample_max_value], dtype=dtype),
    )


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def _dynamic_threshold(m: jax.Array, ratio, max_value) -> jax.Array:
    """Dynamic thresholding of the x0 prediction (dpm_solver.py:426-457)."""
    flat = m.reshape(m.shape[0], -1)
    s = jnp.quantile(jnp.abs(flat), ratio, axis=-1, keepdims=True)
    s = jnp.clip(s, 1.0, max_value)
    return (jnp.clip(flat, -s, s) / s).reshape(m.shape)


def _sched_jnp(sched: DPMSolverSchedule) -> DPMSolverSchedule:
    """Coerce the (numpy) coefficient arrays to jnp for traced indexing.
    Under jit this embeds them as free constants; the schedule is stored as
    numpy precisely so this conversion happens at trace time, not via a
    device->host fetch (see make_schedule)."""
    return DPMSolverSchedule(*[jnp.asarray(f) if isinstance(f, np.ndarray) else f
                               for f in sched])


def solver_step(sched: DPMSolverSchedule, i, x, m_prev, model_out, noise=None,
                m_prev2=None):
    """One solver update. All inputs fp32; `i` may be a traced index.

    Returns (x_next, m_cur).  ``m_prev`` must be zeros for i == 0 (ignored
    there since c_d1[0] == 0); ``m_prev2`` is only read on order-3 steps.
    """
    sched = _sched_jnp(sched)
    m = sched.cvt_x[i] * x + sched.cvt_m[i] * model_out
    m = jax.lax.cond(sched.thresh[0] >= 0,
                     lambda mm: _dynamic_threshold(mm, sched.thresh[0], sched.thresh[1]),
                     lambda mm: mm, m)
    d1_0 = (m - m_prev) * sched.inv_r0[i]
    if m_prev2 is None:
        m_prev2 = jnp.zeros_like(m)
    d1_1 = (m_prev - m_prev2) * sched.inv_r1[i]
    d1 = d1_0 + sched.w01[i] * (d1_0 - d1_1)   # == d1_0 on non-3rd-order steps
    d2 = sched.inv_r01[i] * (d1_0 - d1_1)
    x_next = (sched.c_x[i] * x + sched.c_d0[i] * m + sched.c_d1[i] * d1
              + sched.c_d2[i] * d2)
    if noise is not None:
        x_next = x_next + sched.c_noise[i] * noise
    return x_next, m


def sample_with_solver(sched: DPMSolverSchedule, denoise_fn: Callable,
                       x_T: jax.Array, rng: Optional[jax.Array] = None,
                       with_index: bool = False) -> jax.Array:
    """Run the full solver loop as a lax.scan.

    ``denoise_fn(x, t) -> model_out`` where t is a scalar from sched.timesteps.
    ``rng`` is required for the SDE variants (ignored otherwise — the caller can
    always pass one).  It may be a single key, or a ``[B, 2]`` batch of per-row
    keys (x_T being ``[B, ...]``): per-row keys make each row's SDE noise a
    function of its own key alone — independent of the batch size it happens
    to run in (the continuous-batching determinism contract).
    """
    S = sched.num_steps
    sched = _sched_jnp(sched)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    per_row = getattr(rng, "ndim", 1) == 2
    if per_row:
        noise_keys = jnp.swapaxes(                       # [S, B, 2]
            jax.vmap(lambda k: jax.random.split(k, S))(rng), 0, 1)
    else:
        noise_keys = jax.random.split(rng, S)

    def body(carry, inp):
        x, m_prev, m_prev2 = carry
        i, key = inp
        if with_index:
            # denoise_fn(x, t, i): callers with per-iteration precomputed
            # state (e.g. hoisted AdaLN modulations) index it by i
            model_out = denoise_fn(x, sched.timesteps[i], i)
        else:
            model_out = denoise_fn(x, sched.timesteps[i])
        if per_row:
            z = jax.vmap(lambda k, xx: jax.random.normal(
                k, xx.shape, xx.dtype))(key, x)
        else:
            z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_next, m = solver_step(sched, i, x, m_prev, model_out, noise=z,
                                m_prev2=m_prev2)
        return (x_next, m, m_prev), None

    x0 = x_T.astype(jnp.float32)
    (x_final, _, _), _ = jax.lax.scan(
        body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
        (jnp.arange(S), noise_keys))
    return x_final


# ---------------------------------------------------------------------------
# Training utilities (dpm_solver.py:1024-1062)
# ---------------------------------------------------------------------------

def add_noise(alphas_cumprod: jax.Array, original: jax.Array, noise: jax.Array,
              timesteps: jax.Array) -> jax.Array:
    abar = alphas_cumprod[timesteps]
    a = jnp.sqrt(abar).reshape(abar.shape + (1,) * (original.ndim - abar.ndim))
    s = jnp.sqrt(1.0 - abar).reshape(abar.shape + (1,) * (original.ndim - abar.ndim))
    return a.astype(original.dtype) * original + s.astype(original.dtype) * noise


def get_velocity(alphas_cumprod: jax.Array, original: jax.Array, noise: jax.Array,
                 timesteps: jax.Array) -> jax.Array:
    abar = alphas_cumprod[timesteps]
    a = jnp.sqrt(abar).reshape(abar.shape + (1,) * (original.ndim - abar.ndim))
    s = jnp.sqrt(1.0 - abar).reshape(abar.shape + (1,) * (original.ndim - abar.ndim))
    return a.astype(original.dtype) * noise - s.astype(original.dtype) * original
