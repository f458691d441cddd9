"""Resumable TX-placement optimization.

Demonstrates the checkpoint/resume subsystem on a long-running
optimization: the TX position, optimizer state and step counter are
written atomically every ``--checkpoint-every`` steps, and rerunning the
script picks up exactly where it stopped (kill it mid-run to test).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import optax

from differt2d_tpu.checkpoint import load_leaves, save_leaves
from differt2d_tpu.geometry import Point
from differt2d_tpu.scene import Scene
from differt2d_tpu.utils import received_power


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=101)
    parser.add_argument("--checkpoint-every", type=int, default=10)
    parser.add_argument("--checkpoint", type=str, default="tx_opt.ckpt.npz")
    args = parser.parse_args()

    scene = Scene.square_scene_with_wall()
    key = jax.random.PRNGKey(1234)

    def loss(tx_coords, alpha):
        s = scene.with_transmitters(tx=Point(xy=tx_coords))
        return -s.accumulate_over_paths(
            received_power, reduce_all=True, max_order=1,
            approx=True, alpha=alpha, key=key,
        )

    f_and_df = jax.jit(jax.value_and_grad(loss))
    optimizer = optax.chain(optax.adam(0.01), optax.zero_nans())

    # Not exactly on the central wall (x = 0.5), where gradients are
    # NaN by construction and zero_nans would freeze the iterate.
    tx = jnp.array([0.45, 0.7])
    opt_state = optimizer.init(tx)
    start_step = 0

    state = {"tx": tx, "opt_state": opt_state, "step": jnp.array(0)}
    if os.path.exists(args.checkpoint):
        state = load_leaves(args.checkpoint, state)
        start_step = int(state["step"])
        print(f"resumed from step {start_step}: tx = {state['tx']}")

    tx, opt_state = state["tx"], state["opt_state"]
    alphas = jnp.logspace(0, 2, args.steps)
    for step in range(start_step, args.steps):
        value, grads = f_and_df(tx, alphas[step])
        updates, opt_state = optimizer.update(grads, opt_state)
        tx = tx + updates
        if (step + 1) % args.checkpoint_every == 0 or step + 1 == args.steps:
            save_leaves(
                args.checkpoint,
                {"tx": tx, "opt_state": opt_state, "step": jnp.array(step + 1)},
            )
            print(f"step {step + 1:4d}: loss {float(value):+.4f}  tx {tx}")

    print(f"done: tx = {tx}")


if __name__ == "__main__":
    main()
