import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.diffusion import schedulers as sched
import pytest

pytestmark = pytest.mark.fast


def test_alphas_cumprod_scaled_linear():
    cfg = sched.SchedulerConfig()
    acp = sched.make_alphas_cumprod(cfg)
    assert acp.shape == (1000,)
    # closed form for step 0: acp[0] = 1 - beta_start
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
    assert acp[-1] < 0.01  # near-full noise at t=999
    assert np.all(np.diff(acp) < 0)


def test_add_noise_matches_closed_form():
    cfg = sched.SchedulerConfig()
    acp = jnp.asarray(sched.make_alphas_cumprod(cfg))
    x = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.array([0, 999])
    noisy = sched.add_noise(acp, x, noise, t)
    a0, a999 = float(acp[0]), float(acp[999])
    np.testing.assert_allclose(
        np.asarray(noisy[0, 0, 0, 0]),
        np.sqrt(a0) + 2 * np.sqrt(1 - a0),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(noisy[1, 0, 0, 0]),
        np.sqrt(a999) + 2 * np.sqrt(1 - a999),
        rtol=1e-5,
    )


def test_euler_trailing_timesteps_sd_turbo():
    # sd-turbo 5-step schedule: trailing spacing gives [999, 799, 599, 399, 199]
    s = sched.EulerDiscreteScheduler()
    state = s.set_timesteps(5)
    np.testing.assert_array_equal(
        np.asarray(state.timesteps), [999.0, 799.0, 599.0, 399.0, 199.0]
    )
    assert state.sigmas.shape == (6,)
    assert float(state.sigmas[-1]) == 0.0
    # trailing spacing => init_noise_sigma = max sigma
    np.testing.assert_allclose(
        float(state.init_noise_sigma), float(state.sigmas[0]), rtol=1e-6
    )
    # 1-step schedule: single timestep 999 (turbo single-step distillation)
    state1 = s.set_timesteps(1)
    np.testing.assert_array_equal(np.asarray(state1.timesteps), [999.0])


def test_euler_step_recovers_x0_epsilon():
    """With a perfect epsilon model, iterating Euler to sigma=0 returns x0."""
    s = sched.EulerDiscreteScheduler()
    state = s.set_timesteps(25)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    sample = x0 + state.sigmas[0] * eps  # karras forward at max sigma
    for i in range(state.num_steps):
        sigma = state.sigmas[i]
        # the true epsilon for karras parametrization: (x_t - x0)/sigma
        model_out = (sample - x0) / sigma
        sample = s.step(state, model_out, i, sample)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)


def test_euler_scale_model_input():
    s = sched.EulerDiscreteScheduler()
    state = s.set_timesteps(5)
    x = jnp.ones((1, 2, 2, 4))
    scaled = s.scale_model_input(state, x, 0)
    expected = 1.0 / np.sqrt(float(state.sigmas[0]) ** 2 + 1)
    np.testing.assert_allclose(np.asarray(scaled[0, 0, 0, 0]), expected, rtol=1e-5)


def test_ddim_leading_timesteps():
    s = sched.DDIMScheduler()
    state = s.set_timesteps(4)
    # leading: arange(4)*250 reversed + offset 1 -> [751, 501, 251, 1]
    np.testing.assert_array_equal(np.asarray(state.timesteps), [751, 501, 251, 1])


def test_ddim_step_perfect_model_recovers_x0():
    s = sched.DDIMScheduler()
    state = s.set_timesteps(10)
    acp = state.alphas_cumprod
    x0 = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(3), x0.shape)
    t0 = state.timesteps[0]
    sample = jnp.sqrt(acp[t0]) * x0 + jnp.sqrt(1 - acp[t0]) * eps
    for i in range(state.num_steps):
        t = state.timesteps[i]
        a_t = acp[t]
        true_eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        sample = s.step(state, true_eps, i, sample)
    # with set_alpha_to_one=False the last step lands at final_alpha=acp[0],
    # so sample = sqrt(acp0) x0 + sqrt(1-acp0) eps exactly (telescoping)
    a_final = state.final_alpha_cumprod
    expected = jnp.sqrt(a_final) * x0 + jnp.sqrt(1 - a_final) * eps
    np.testing.assert_allclose(np.asarray(sample), np.asarray(expected), atol=1e-4)


def test_ddpm_step_reduces_noise():
    s = sched.DDPMScheduler()
    state = s.set_timesteps(50)
    x0 = jnp.zeros((1, 4, 4, 4))
    sample = jax.random.normal(jax.random.key(4), x0.shape)
    key = jax.random.key(5)
    for i in range(state.num_steps):
        t = state.timesteps[i]
        a_t = state.alphas_cumprod[t]
        true_eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        key, sub = jax.random.split(key)
        sample = s.step(state, true_eps, i, sample, sub)
    assert float(jnp.abs(sample).mean()) < 0.1


def test_euler_ancestral_runs_and_denoises():
    s = sched.EulerAncestralScheduler()
    state = s.set_timesteps(5)
    x0 = jnp.zeros((1, 4, 4, 4))
    sample = state.init_noise_sigma * jax.random.normal(jax.random.key(6), x0.shape)
    key = jax.random.key(7)
    for i in range(state.num_steps):
        model_out = (sample - x0) / state.sigmas[i]
        key, sub = jax.random.split(key)
        sample = s.step(state, model_out, i, sample, sub)
    np.testing.assert_allclose(np.asarray(sample), 0.0, atol=1e-4)


def test_v_prediction_velocity_consistency():
    cfg = sched.SchedulerConfig(prediction_type="v_prediction")
    acp = jnp.asarray(sched.make_alphas_cumprod(cfg))
    x0 = jax.random.normal(jax.random.key(8), (1, 4))
    eps = jax.random.normal(jax.random.key(9), (1, 4))
    t = jnp.array([500])
    v = sched.get_velocity(acp, x0, eps, t)
    # DDIM with v-prediction and a perfect v recovers x0 in its x0-estimate
    s = sched.DDIMScheduler(cfg)
    state = s.set_timesteps(10)
    a_t = acp[500]
    sample = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
    pred_x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(1 - a_t) * v
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-5)


def test_sampling_inside_jit_fori_loop():
    """The whole denoise loop must compile into one XLA program."""
    s = sched.EulerDiscreteScheduler()
    state = s.set_timesteps(5)
    x0 = jnp.zeros((1, 8, 8, 4))

    @jax.jit
    def run(sample):
        def body(i, sample):
            model_out = (sample - x0) / state.sigmas[i]
            return s.step(state, model_out, i, sample)

        return jax.lax.fori_loop(0, state.num_steps, body, sample)

    init = state.init_noise_sigma * jax.random.normal(jax.random.key(10), x0.shape)
    out = run(init)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_make_scheduler_factory():
    assert isinstance(sched.make_scheduler("ddpm"), sched.DDPMScheduler)
    assert isinstance(sched.make_scheduler("ddim"), sched.DDIMScheduler)
    assert isinstance(
        sched.make_scheduler("euler_discrete"), sched.EulerDiscreteScheduler
    )
    cfg = dataclasses.replace(sched.SchedulerConfig(), timestep_spacing="trailing")
    assert sched.make_scheduler("euler_discrete", cfg).config.timestep_spacing == (
        "trailing"
    )
