"""DPM-Solver golden tests.

The precomputed-coefficient scan implementation is validated against a literal
stateful numpy transcription of the reference solver equations
(reference: vibevoice/schedule/dpm_solver.py:528-1022) — independently coded
here, mirroring the original control flow step by step.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibevoice_tpu.schedule import (
    DPMSolverConfig,
    add_noise,
    get_velocity,
    make_alphas_cumprod,
    make_schedule,
    sample_with_solver,
    solver_step,
)


# --- literal reference replica (stateful, numpy) ----------------------------

class RefSolver:
    def __init__(self, cfg: DPMSolverConfig, num_steps: int):
        self.cfg = cfg
        abar = make_alphas_cumprod(cfg.beta_schedule, cfg.num_train_timesteps,
                                   beta_start=cfg.beta_start, beta_end=cfg.beta_end)
        sig_full = np.sqrt((1 - abar) / abar)
        ts = np.linspace(0, cfg.num_train_timesteps - 1, num_steps + 1).round()[::-1][:-1]
        sigmas = np.interp(ts, np.arange(len(sig_full)), sig_full)
        sigma_last = 0.0 if cfg.final_sigmas_type == "zero" else sig_full[0]
        self.sigmas = np.concatenate([sigmas, [sigma_last]])
        self.timesteps = ts.astype(np.int64)
        self.model_outputs = [None] * cfg.solver_order
        self.lower_order_nums = 0
        self.step_index = 0

    def _alpha_sigma(self, sigma):
        a = 1.0 / math.sqrt(sigma ** 2 + 1)
        return a, sigma * a

    def convert(self, m, x):
        cfg = self.cfg
        a, s = self._alpha_sigma(self.sigmas[self.step_index])
        if cfg.is_pp:
            if cfg.prediction_type == "epsilon":
                return (x - s * m) / a
            if cfg.prediction_type == "sample":
                return m
            return a * x - s * m  # v_prediction
        else:
            if cfg.prediction_type == "epsilon":
                return m
            if cfg.prediction_type == "sample":
                return (x - a * m) / s
            return a * m + s * x  # v_prediction

    def first_order(self, m, x, z):
        cfg = self.cfg
        i = self.step_index
        a_t, s_t = self._alpha_sigma(self.sigmas[i + 1])
        a_s, s_s = self._alpha_sigma(self.sigmas[i])
        lt = np.log(a_t) - np.log(max(s_t, 1e-300))
        ls = np.log(a_s) - np.log(max(s_s, 1e-300))
        h = lt - ls
        if cfg.algorithm_type == "dpmsolver++":
            return (s_t / s_s) * x - (a_t * (math.exp(-h) - 1.0)) * m
        if cfg.algorithm_type == "dpmsolver":
            return (a_t / a_s) * x - (s_t * (math.exp(h) - 1.0)) * m
        if cfg.algorithm_type == "sde-dpmsolver++":
            return ((s_t / s_s) * math.exp(-h)) * x + (a_t * (1 - math.exp(-2 * h))) * m \
                + s_t * math.sqrt(1 - math.exp(-2 * h)) * z
        if cfg.algorithm_type == "sde-dpmsolver":
            return (a_t / a_s) * x - 2 * (s_t * (math.exp(h) - 1)) * m \
                + s_t * math.sqrt(math.exp(2 * h) - 1) * z
        raise ValueError

    def second_order(self, x, z):
        cfg = self.cfg
        i = self.step_index
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        a_t, s_t = self._alpha_sigma(self.sigmas[i + 1])
        a_s0, s_s0 = self._alpha_sigma(self.sigmas[i])
        a_s1, s_s1 = self._alpha_sigma(self.sigmas[i - 1])
        lt = np.log(a_t) - np.log(max(s_t, 1e-300))
        l0 = np.log(a_s0) - np.log(max(s_s0, 1e-300))
        l1 = np.log(a_s1) - np.log(max(s_s1, 1e-300))
        h, h0 = lt - l0, l0 - l1
        r0 = h0 / h
        d0, d1 = m0, (1.0 / r0) * (m0 - m1)
        mid = cfg.solver_type == "midpoint"
        if cfg.algorithm_type == "dpmsolver++":
            if mid:
                return (s_t / s_s0) * x - (a_t * (math.exp(-h) - 1)) * d0 \
                    - 0.5 * (a_t * (math.exp(-h) - 1)) * d1
            return (s_t / s_s0) * x - (a_t * (math.exp(-h) - 1)) * d0 \
                + (a_t * ((math.exp(-h) - 1) / h + 1)) * d1
        if cfg.algorithm_type == "dpmsolver":
            if mid:
                return (a_t / a_s0) * x - (s_t * (math.exp(h) - 1)) * d0 \
                    - 0.5 * (s_t * (math.exp(h) - 1)) * d1
            return (a_t / a_s0) * x - (s_t * (math.exp(h) - 1)) * d0 \
                - (s_t * ((math.exp(h) - 1) / h - 1)) * d1
        if cfg.algorithm_type == "sde-dpmsolver++":
            if mid:
                return (s_t / s_s0 * math.exp(-h)) * x + (a_t * (1 - math.exp(-2 * h))) * d0 \
                    + 0.5 * (a_t * (1 - math.exp(-2 * h))) * d1 \
                    + s_t * math.sqrt(1 - math.exp(-2 * h)) * z
            return (s_t / s_s0 * math.exp(-h)) * x + (a_t * (1 - math.exp(-2 * h))) * d0 \
                + (a_t * ((1 - math.exp(-2 * h)) / (-2 * h) + 1)) * d1 \
                + s_t * math.sqrt(1 - math.exp(-2 * h)) * z
        if cfg.algorithm_type == "sde-dpmsolver":
            if mid:
                return (a_t / a_s0) * x - 2 * (s_t * (math.exp(h) - 1)) * d0 \
                    - (s_t * (math.exp(h) - 1)) * d1 \
                    + s_t * math.sqrt(math.exp(2 * h) - 1) * z
            return (a_t / a_s0) * x - 2 * (s_t * (math.exp(h) - 1)) * d0 \
                - 2 * (s_t * ((math.exp(h) - 1) / h - 1)) * d1 \
                + s_t * math.sqrt(math.exp(2 * h) - 1) * z
        raise ValueError

    def third_order(self, x):
        cfg = self.cfg
        i = self.step_index
        m0, m1, m2 = self.model_outputs[-1], self.model_outputs[-2], self.model_outputs[-3]
        a_t, s_t = self._alpha_sigma(self.sigmas[i + 1])
        a_s0, s_s0 = self._alpha_sigma(self.sigmas[i])
        a_s1, s_s1 = self._alpha_sigma(self.sigmas[i - 1])
        a_s2, s_s2 = self._alpha_sigma(self.sigmas[i - 2])
        lam = lambda a, s: np.log(a) - np.log(max(s, 1e-300))
        lt, l0, l1, l2 = lam(a_t, s_t), lam(a_s0, s_s0), lam(a_s1, s_s1), lam(a_s2, s_s2)
        h, h0, h1 = lt - l0, l0 - l1, l1 - l2
        r0, r1 = h0 / h, h1 / h
        d0 = m0
        d1_0, d1_1 = (m0 - m1) / r0, (m1 - m2) / r1
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        if cfg.algorithm_type == "dpmsolver++":
            return ((s_t / s_s0) * x - (a_t * (math.exp(-h) - 1)) * d0
                    + (a_t * ((math.exp(-h) - 1) / h + 1)) * d1
                    - (a_t * ((math.exp(-h) - 1 + h) / h ** 2 - 0.5)) * d2)
        if cfg.algorithm_type == "dpmsolver":
            return ((a_t / a_s0) * x - (s_t * (math.exp(h) - 1)) * d0
                    - (s_t * ((math.exp(h) - 1) / h - 1)) * d1
                    - (s_t * ((math.exp(h) - 1 - h) / h ** 2 - 0.5)) * d2)
        raise ValueError

    def step(self, model_output, x, z):
        cfg = self.cfg
        S = len(self.timesteps)
        i = self.step_index
        lower_order_final = (i == S - 1) and (
            cfg.euler_at_final or (cfg.lower_order_final and S < 15)
            or cfg.final_sigmas_type == "zero")
        lower_order_second = (i == S - 2) and cfg.lower_order_final and S < 15
        m = self.convert(model_output, x)
        for j in range(cfg.solver_order - 1):
            self.model_outputs[j] = self.model_outputs[j + 1]
        self.model_outputs[-1] = m
        if cfg.solver_order == 1 or self.lower_order_nums < 1 or lower_order_final:
            out = self.first_order(m, x, z)
        elif cfg.solver_order == 2 or self.lower_order_nums < 2 or lower_order_second:
            out = self.second_order(x, z)
        else:
            out = self.third_order(x)
        if self.lower_order_nums < cfg.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return out


ALGOS = ["dpmsolver++", "sde-dpmsolver++", "dpmsolver", "sde-dpmsolver"]


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("pred", ["v_prediction", "epsilon"])
@pytest.mark.parametrize("solver_type", ["midpoint", "heun"])
def test_matches_reference_equations(algo, order, pred, solver_type):
    if not algo.endswith("++"):
        final = "sigma_min"  # zero final sigma only valid for ++ (dpm_solver.py:282-285)
    else:
        final = "zero"
    cfg = DPMSolverConfig(num_train_timesteps=100, beta_schedule="cosine",
                          prediction_type=pred, algorithm_type=algo,
                          solver_order=order, solver_type=solver_type,
                          final_sigmas_type=final)
    S = 8
    sched = make_schedule(cfg, S)

    rs = np.random.RandomState(0)
    x0 = rs.randn(2, 4).astype(np.float64)
    model_outs = [rs.randn(2, 4) for _ in range(S)]
    noises = [rs.randn(2, 4) for _ in range(S)]

    ref = RefSolver(cfg, S)
    np.testing.assert_allclose(np.asarray(sched.timesteps), ref.timesteps, atol=1e-4)
    x_ref = x0.copy()
    for i in range(S):
        x_ref = ref.step(model_outs[i], x_ref, noises[i])

    x = jnp.asarray(x0, jnp.float32)
    m_prev = jnp.zeros_like(x)
    m_prev2 = jnp.zeros_like(x)
    for i in range(S):
        x, m = solver_step(sched, i, x, m_prev, jnp.asarray(model_outs[i], jnp.float32),
                           noise=jnp.asarray(noises[i], jnp.float32), m_prev2=m_prev2)
        m_prev2, m_prev = m_prev, m
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("algo", ["dpmsolver++", "dpmsolver"])
def test_third_order_matches_reference(algo):
    final = "zero" if algo.endswith("++") else "sigma_min"
    cfg = DPMSolverConfig(num_train_timesteps=100, beta_schedule="cosine",
                          prediction_type="v_prediction", algorithm_type=algo,
                          solver_order=3, final_sigmas_type=final)
    S = 9
    sched = make_schedule(cfg, S)
    rs = np.random.RandomState(5)
    x0 = rs.randn(2, 4)
    model_outs = [rs.randn(2, 4) for _ in range(S)]

    ref = RefSolver(cfg, S)
    ref.model_outputs = [None] * 3
    x_ref = x0.copy()
    for i in range(S):
        x_ref = ref.step(model_outs[i], x_ref, np.zeros_like(x_ref))

    x = jnp.asarray(x0, jnp.float32)
    m_prev = jnp.zeros_like(x)
    m_prev2 = jnp.zeros_like(x)
    for i in range(S):
        x, m = solver_step(sched, i, x, m_prev,
                           jnp.asarray(model_outs[i], jnp.float32), m_prev2=m_prev2)
        m_prev2, m_prev = m_prev, m
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=3e-4, atol=3e-4)


def test_perfect_denoiser_recovers_x0():
    """With a denoiser that always reports the true x0 (via v), dpmsolver++
    must land exactly on x0 (final sigma = 0)."""
    cfg = DPMSolverConfig(prediction_type="v_prediction", algorithm_type="dpmsolver++")
    sched = make_schedule(cfg, 10)
    abar = jnp.asarray(make_alphas_cumprod(cfg.beta_schedule, cfg.num_train_timesteps),
                       jnp.float32)
    x0 = jnp.asarray(np.random.RandomState(1).randn(3, 5), jnp.float32)

    sig_full = jnp.sqrt((1 - abar) / abar)

    def denoise(x, t):
        # v such that x0_pred = alpha*x - sigma*v == x0
        sigma = jnp.interp(t, jnp.arange(len(sig_full), dtype=jnp.float32), sig_full)
        alpha = 1.0 / jnp.sqrt(sigma ** 2 + 1)
        s_t = sigma * alpha
        return (alpha * x - x0) / jnp.maximum(s_t, 1e-8)

    x = sample_with_solver(sched, denoise, jnp.asarray(
        np.random.RandomState(2).randn(3, 5), jnp.float32))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_add_noise_get_velocity_identity():
    abar = jnp.asarray(make_alphas_cumprod("cosine", 50), jnp.float32)
    rs = np.random.RandomState(3)
    x0 = jnp.asarray(rs.randn(4, 8), jnp.float32)
    eps = jnp.asarray(rs.randn(4, 8), jnp.float32)
    t = jnp.asarray([0, 10, 25, 49])
    xt = add_noise(abar, x0, eps, t)
    v = get_velocity(abar, x0, eps, t)
    a = jnp.sqrt(abar[t])[:, None]
    s = jnp.sqrt(1 - abar[t])[:, None]
    # alpha*x_t - sigma*v == x0  and  sigma*x_t + alpha*v == eps
    np.testing.assert_allclose(np.asarray(a * xt - s * v), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s * xt + a * v), np.asarray(eps), atol=1e-5)


def test_beta_schedules_shapes():
    from vibevoice_tpu.schedule import make_betas
    for sch in ["linear", "scaled_linear", "cosine", "squaredcos_cap_v2", "cauchy", "laplace"]:
        b = make_betas(sch, 100)
        assert b.shape == (100,)
        assert np.all(b > 0) and np.all(b <= 0.999)
