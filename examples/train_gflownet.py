"""Train a GFlowNet path-candidate sampler.

TPU-native analog of the reference notebook
``docs/source/notebooks/cost20120_helsinki_model.ipynb``: learn to sample
path candidates proportionally to their validity instead of enumerating
all of them. Prints the valid-sample fraction before and after training.
"""

import argparse

import jax
import jax.numpy as jnp
import optax

from differt2d_tpu import tracer
from differt2d_tpu.checkpoint import save_leaves
from differt2d_tpu.models import (
    FlowNet,
    make_reward_fn,
    make_train_step,
    sample_trajectories,
)
from differt2d_tpu.models.gflownet import init_train_params
from differt2d_tpu.scene import Scene, SceneName


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--scene",
        type=str,
        default="square_scene_with_obstacle",
        choices=list(SceneName.__args__),
    )
    parser.add_argument("--order", type=int, default=2)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument(
        "--scan-chunk", type=int, default=1,
        help="steps per device-side lax.scan chunk (chunk > 1 runs the"
        " same PRNG stream as chunk=1 but pays one host round trip per"
        " chunk -- needed for reference-scale 100k-step runs through a"
        " remote-TPU link)",
    )
    parser.add_argument("--learning-rate", type=float, default=1e-2)
    parser.add_argument(
        "--explore", type=float, default=0.0,
        help="epsilon-uniform exploration share during training"
        " (off-policy trajectory balance; needed for sparse rewards"
        " like city-extract order 2: 2 valid of 18,360 candidates)",
    )
    parser.add_argument(
        "--min-reward", type=float, default=1e-3,
        help="reward floor for invalid candidates; for huge candidate"
        " sets lower it so the floor mass does not dominate the"
        " partition function (e.g. 1e-5 at 18k candidates)",
    )
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument(
        "--tx", type=float, nargs=2, default=None, metavar=("X", "Y"),
        help="TX position (default: the scene's own TX)",
    )
    parser.add_argument(
        "--rx", type=float, nargs=2, default=None, metavar=("X", "Y"),
        help="RX position (default: the scene's own RX)",
    )
    args = parser.parse_args()

    scene = Scene.from_scene_name(args.scene)
    arrays = tracer.scene_arrays(scene)
    walls = arrays.walls
    num_walls = arrays.num_objects
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    if args.scene == "city_extract_scene" and args.tx is None and args.rx is None:
        # The geojson default corner TX/RX (reference from_geojson
        # semantics) see ZERO valid low-order paths across this dense
        # extract -- an all-zero reward trains nothing. Default to a
        # street-corridor pair with LOS + order-1 reflections instead.
        tx = jnp.array([0.667, 0.635], dtype=walls.dtype)
        rx = jnp.array([0.670, 0.400], dtype=walls.dtype)
        print("city extract: using street-corridor TX/RX "
              f"{tx.tolist()} -> {rx.tolist()} (see --tx/--rx)")
    if args.tx is not None:
        tx = jnp.array(args.tx, dtype=walls.dtype)
    if args.rx is not None:
        rx = jnp.array(args.rx, dtype=walls.dtype)

    model = FlowNet(num_walls=num_walls, max_order=args.order)
    reward = make_reward_fn(scene, order=args.order, min_reward=args.min_reward)
    params = init_train_params(model, jax.random.PRNGKey(0), walls)
    optimizer = optax.adam(args.learning_rate)
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, optimizer, reward, walls, tx, rx,
        order=args.order, batch=args.batch, explore_eps=args.explore,
    )

    def valid_fraction(p, k):
        cands, _ = sample_trajectories(
            model, p["model"], k, walls, tx, rx, args.order, 1024
        )
        return float(jnp.mean(reward(cands, tx, rx) == 1.0))

    k_eval = jax.random.PRNGKey(7)
    print(f"valid fraction before: {valid_fraction(params, k_eval):.3f}")

    k = jax.random.PRNGKey(1)
    if args.scan_chunk > 1:
        # Device-side chunks: identical PRNG stream to the per-step
        # loop (the key splits inside the scan body), one host round
        # trip per chunk instead of per step.
        import jax.lax as lax

        @jax.jit
        def run_chunk(params, opt_state, k):
            def body(carry, i):
                p, o, kk = carry
                kk, k_step = jax.random.split(kk)
                p, o, loss = step(p, o, k_step)
                return (p, o, kk), loss

            (params, opt_state, k), losses = lax.scan(
                body, (params, opt_state, k),
                jnp.arange(args.scan_chunk),
            )
            return params, opt_state, k, losses

        done = 0
        while done < args.steps:
            n = min(args.scan_chunk, args.steps - done)
            if n < args.scan_chunk:
                # Tail chunk: fall back to the per-step loop (same
                # stream) instead of compiling a second scan length.
                for _ in range(n):
                    k, k_step = jax.random.split(k)
                    params, opt_state, loss = step(params, opt_state, k_step)
                done += n
                print(f"step {done:6d}: loss {float(loss):.4f}")
                break
            params, opt_state, k, losses = run_chunk(
                params, opt_state, k
            )
            done += n
            print(f"step {done:6d}: loss {float(losses[-1]):.4f}")
    else:
        for i in range(args.steps):
            k, k_step = jax.random.split(k)
            params, opt_state, loss = step(params, opt_state, k_step)
            if (i + 1) % max(1, args.steps // 10) == 0:
                print(f"step {i + 1:5d}: loss {float(loss):.4f}")

    print(f"valid fraction after:  {valid_fraction(params, k_eval):.3f}")
    if args.checkpoint:
        save_leaves(args.checkpoint, params)
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
