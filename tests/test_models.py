"""GFlowNet sampler tests: reward correctness against the tracer's
validity, and a short training run that must shift sampling mass onto
valid candidates."""

import jax
import jax.numpy as jnp
import optax
import pytest

from differt2d_tpu import tracer
from differt2d_tpu.models import (
    FlowNet,
    make_reward_fn,
    make_train_step,
    sample_trajectories,
)
from differt2d_tpu.models.gflownet import init_train_params
from differt2d_tpu.scene import Scene


@pytest.fixture(scope="module")
def scene():
    return Scene.square_scene_with_wall()


def test_reward_matches_validity(scene, key):
    reward = make_reward_fn(scene, order=1)
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    cands = jnp.arange(5, dtype=jnp.int32)[:, None]  # all order-1 candidates
    r = reward(cands, tx, rx)
    assert r.shape == (5,)
    assert jnp.all((jnp.abs(r - 1.0) < 1e-6) | (jnp.abs(r - 1e-3) < 1e-6))
    # Cross-check against the scene-level path validity.
    from differt2d_tpu.logic import is_true

    for i, (_, _, valid, _, _) in enumerate(
        scene.all_paths(order=1, approx=False)
    ):
        expected = 1.0 if bool(is_true(valid, approx=False)) else 1e-3
        assert abs(float(r[i]) - expected) < 1e-6


def test_sampler_shapes(scene, key):
    walls = tracer.scene_arrays(scene).walls
    model = FlowNet(num_walls=5, max_order=2)
    params = init_train_params(model, key, walls)
    cands, log_pf = sample_trajectories(
        model, params["model"], key, walls,
        scene.transmitters["tx"].xy, scene.receivers["rx"].xy,
        order=2, batch=16,
    )
    assert cands.shape == (16, 2)
    assert log_pf.shape == (16,)
    assert jnp.all((cands >= 0) & (cands < 5))
    # No consecutive repeats.
    assert not jnp.any(cands[:, 1:] == cands[:, :-1])
    assert jnp.all(jnp.isfinite(log_pf))


def test_training_improves_valid_fraction(scene, key):
    walls = tracer.scene_arrays(scene).walls
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    model = FlowNet(num_walls=5, max_order=1, embed_dim=16, hidden_dim=32)
    reward = make_reward_fn(scene, order=1)

    params = init_train_params(model, key, walls)
    optimizer = optax.adam(3e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, reward, walls, tx, rx, order=1, batch=64)

    def valid_fraction(p, k):
        cands, _ = sample_trajectories(
            model, p["model"], k, walls, tx, rx, order=1, batch=256
        )
        return float(jnp.mean(reward(cands, tx, rx) == 1.0))

    k_eval = jax.random.PRNGKey(7)
    before = valid_fraction(params, k_eval)
    k = key
    losses = []
    for _ in range(60):
        k, k_step = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, k_step)
        losses.append(float(loss))
    after = valid_fraction(params, k_eval)
    assert jnp.isfinite(jnp.asarray(losses)).all()
    assert losses[-1] < losses[0]
    # The sampler should concentrate on valid candidates.
    assert after >= before


def test_exploration_off_policy_stays_finite(key):
    """epsilon-uniform exploration forces actions the policy may assign
    ~0 probability; the clamped log_pf must keep the trajectory-balance
    loss finite (unclamped, a saturated policy NaN'd within the first
    1000 steps of the city-extract order-2 run)."""
    import optax

    from differt2d_tpu import tracer
    from differt2d_tpu.models import (
        FlowNet, make_reward_fn, make_train_step)
    from differt2d_tpu.models.gflownet import init_train_params
    from differt2d_tpu.scene import Scene

    scene = Scene.square_scene_with_obstacle()
    arrays = tracer.scene_arrays(scene)
    walls = arrays.walls
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    model = FlowNet(num_walls=arrays.num_objects, max_order=2)
    reward = make_reward_fn(scene, order=2, min_reward=1e-5)
    params = init_train_params(model, jax.random.PRNGKey(0), walls)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, optimizer, reward, walls, tx, rx, order=2, batch=32,
        explore_eps=0.5,  # aggressive: half the actions off-policy
    )
    k = key
    for _ in range(30):
        k, k_step = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, k_step)
        assert jnp.isfinite(float(loss))
