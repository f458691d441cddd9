"""GFlowNet path-candidate sampler.

TPU-first reimplementation of the reference's ML demonstration
(``docs/source/notebooks/cost20120_helsinki_model.ipynb``): learn to
*sample* path candidates (sequences of wall indices) with probability
proportional to whether they yield a valid ray path, instead of
enumerating all ``n * (n-1)**(order-1)`` of them. The reference uses an
Equinox FlowModel (per-wall embedding MLP + flow MLP, flow-matching loss,
adam 3e-5, notebook cells 18-30); here:

* a DeepSets scene encoder (per-wall MLP, mean pool) + autoregressive
  policy over the next wall index, in flax.linen;
* trajectory-balance objective (log Z + sum log P_F = log R; the backward
  policy is deterministic for sequence prefixes, so its term vanishes) --
  same fixed point as flow matching, and its single scan per trajectory
  maps better onto the MXU than per-state flow sums;
* rewards evaluated by the batched tracer's hard validity, entirely
  on-device, so the whole training step is one jitted program.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..defaults import DEFAULT_PATCH
from .. import tracer as _tracer


class FlowNet(nn.Module):
    """DeepSets scene encoder + autoregressive next-wall policy.

    Input: wall array ``[W, 2, 2]``, tx/rx ``[2]``, and a partial
    candidate (previous wall index one-hot, step index). Output: logits
    over the next wall index.
    """

    num_walls: int
    embed_dim: int = 64
    hidden_dim: int = 128
    max_order: int = 3

    @nn.compact
    def __call__(
        self,
        walls: jax.Array,
        tx: jax.Array,
        rx: jax.Array,
        prev_onehot: jax.Array,
        step_onehot: jax.Array,
    ) -> jax.Array:
        # Per-wall embedding (DeepSets phi), mean-pooled scene context.
        flat_walls = walls.reshape(self.num_walls, 4)
        phi = nn.Dense(self.embed_dim)(flat_walls)
        phi = nn.relu(phi)
        phi = nn.Dense(self.embed_dim)(phi)
        context = jnp.mean(phi, axis=0)

        state = jnp.concatenate([context, tx, rx, prev_onehot, step_onehot])
        h = nn.Dense(self.hidden_dim)(state)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.relu(h)
        logits = nn.Dense(self.num_walls)(h)

        # No consecutive repeats (complete-graph semantics).
        logits = jnp.where(prev_onehot > 0.5, -jnp.inf, logits)
        return logits


def sample_trajectories(
    model: FlowNet,
    params,
    key: jax.Array,
    walls: jax.Array,
    tx: jax.Array,
    rx: jax.Array,
    order: int,
    batch: int,
    explore_eps: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Sample ``batch`` candidate sequences of length ``order``.

    ``explore_eps > 0`` mixes an epsilon-uniform behavior policy into
    the per-step action draw (standard off-policy trajectory-balance
    exploration: the returned ``log_pf`` is still the MODEL's
    log-probability of the sampled actions, so the TB loss stays
    well-posed).  Needle-in-a-haystack rewards need it: the city
    extract at order 2 has 2 valid candidates out of 18,360, and a
    purely on-policy sampler that never hits one collapses to the
    reward floor without ever finding them.

    :return: ``(candidates int32[batch, order], log_pf[batch])`` where
        ``log_pf`` is the summed forward log-probability of each sample.
    """
    W = model.num_walls

    def sample_one(key_i):
        def step(carry, step_idx):
            key_c, prev_onehot, log_pf = carry
            step_onehot = jax.nn.one_hot(step_idx, model.max_order)
            logits = model.apply(params, walls, tx, rx, prev_onehot, step_onehot)
            key_c, key_s = jax.random.split(key_c)
            choice = jax.random.categorical(key_s, logits)
            if explore_eps > 0.0:
                key_c, key_u, key_b = jax.random.split(key_c, 3)
                uniform = jax.random.randint(key_u, (), 0, W)
                take_u = jax.random.bernoulli(key_b, explore_eps)
                choice = jnp.where(take_u, uniform, choice)
            # Clamp: epsilon-exploration can force actions the model
            # gives ~0 probability; log_softmax -> -inf there would NaN
            # the trajectory-balance loss.  -30 (prob 1e-13) is never
            # reached by on-policy draws.
            log_pf = log_pf + jnp.maximum(
                jax.nn.log_softmax(logits)[choice], -30.0
            )
            return (key_c, jax.nn.one_hot(choice, W), log_pf), choice

        init = (key_i, jnp.zeros(W), jnp.array(0.0))
        (_, _, log_pf), choices = jax.lax.scan(
            step, init, jnp.arange(order)
        )
        return choices.astype(jnp.int32), log_pf

    return jax.vmap(sample_one)(jax.random.split(key, batch))


def make_reward_fn(
    scene,
    order: int,
    *,
    tol: float = 1e-2,
    patch: float = DEFAULT_PATCH,
    min_reward: float = 1e-3,
) -> Callable[[jax.Array, jax.Array, jax.Array], jax.Array]:
    """Reward = 1 if the candidate yields a valid image-method path, else
    ``min_reward`` (the reference's reward, notebook cell 18, with a floor
    so log R stays finite).

    :return: ``reward(cands int32[B, order], tx[2], rx[2]) -> [B]``.
    """
    arrays = _tracer.scene_arrays(scene)
    if arrays is None:
        msg = "reward_fn requires Wall/RIS/Vertex objects only"
        raise ValueError(msg)

    def reward(cands: jax.Array, tx: jax.Array, rx: jax.Array) -> jax.Array:
        cw = arrays.walls[cands]
        ckind = arrays.kind[cands]
        cphi = arrays.phi[cands]
        pts = _tracer._solve_image(tx, rx, cw, ckind)
        B = cands.shape[0]
        pts_full = jnp.concatenate(
            [jnp.broadcast_to(tx, (B, 1, 2)), pts,
             jnp.broadcast_to(rx, (B, 1, 2))],
            axis=1,
        )
        loss = _tracer._bounce_residuals(pts_full, cw, ckind, cphi)
        on = _tracer._on_objects(pts, cw, ckind, False, None, None)
        blk = _tracer._blocked(pts_full, cands, arrays, patch, False, None, None)
        valid = on & (~blk) & (loss < tol)
        return jnp.where(valid, 1.0, min_reward)

    return reward


def make_train_step(
    model: FlowNet,
    optimizer,
    reward_fn,
    walls: jax.Array,
    tx: jax.Array,
    rx: jax.Array,
    order: int,
    batch: int = 64,
    explore_eps: float = 0.0,
):
    """Jitted trajectory-balance training step.

    Loss = mean over samples of ``(log Z + log P_F(x) - log R(x))^2``
    with a learnable scalar ``log Z`` carried in the parameter tree.

    :return: ``step(train_params, opt_state, key) ->
        (train_params, opt_state, loss)`` where ``train_params`` is
        ``{"model": flax params, "log_z": scalar}``.
    """

    def loss_fn(train_params, key):
        cands, log_pf = sample_trajectories(
            model, train_params["model"], key, walls, tx, rx, order, batch,
            explore_eps=explore_eps,
        )
        log_r = jnp.log(reward_fn(cands, tx, rx))
        err = train_params["log_z"] + log_pf - log_r
        return jnp.mean(err**2)

    @jax.jit
    def step(train_params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(train_params, key)
        # Pass params so params-aware transforms (adamw, lars, ...) work.
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        train_params = jax.tree_util.tree_map(
            lambda p, u: p + u, train_params, updates
        )
        return train_params, opt_state, loss

    return step


def init_train_params(
    model: FlowNet, key: jax.Array, walls: jax.Array
) -> dict:
    """Initialize ``{"model": ..., "log_z": 0.0}`` parameters."""
    params = model.init(
        key,
        walls,
        jnp.zeros(2),
        jnp.zeros(2),
        jnp.zeros(model.num_walls),
        jnp.zeros(model.max_order),
    )
    return {"model": params, "log_z": jnp.array(0.0)}
