"""Step-level interleaved A/B: bf16 image train step with the backward
kernels' gradient shipped f32 (pre-r5 behaviour, MHADA_BWD_G_F32=1 at trace
time) vs the input dtype (flash-bwd convention).

Both variants are traced in ONE process and timed in alternating rounds
(the round-5 sequential-run drift lesson, PERF.md): tunnel/chip load drifts
~15% between sequential runs, so same-process interleaving is the only
protocol that supports a step-level claim.

Run: python scripts/train_qtile_ab.py [--steps 10] [--rounds 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dataclasses import replace

    from mhada_tpu.config import ImageTrainConfig
    from mhada_tpu.train.train_image import (
        create_train_state, make_image_train_step,
    )
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--env", default="MHADA_BWD_G_F32",
                    help="trace-time env hook to A/B: MHADA_BWD_G_F32 "
                         "(f32-shipped gradients, pre-r5) or "
                         "MHADA_TM_TRAIN (token-major training kernels; "
                         "'0' disables => head-major baseline)")
    args = ap.parse_args()

    cfg = replace(ImageTrainConfig(), compute_dtype="bfloat16")
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(commit_to_device, state)
    vgg = jax.tree.map(commit_to_device, vgg)
    rng = np.random.default_rng(0)
    h, w = cfg.image_size
    content = commit_to_device(jnp.asarray(
        rng.uniform(0, 255, (cfg.batch_size, h, w, 3)), jnp.float32))
    style = commit_to_device(jnp.asarray(
        rng.uniform(0, 255, (cfg.batch_size, h, w, 3)), jnp.float32))

    if args.env == "MHADA_BWD_G_F32":
        variants = (("g_f32(old)", "1"), ("g_dtype(new)", "0"))
    else:
        variants = ((f"{args.env}=0(off)", "0"), (f"{args.env}=1(on)", "1"))
    steps = {}
    losses = {}
    for name, flag in variants:
        os.environ[args.env] = flag
        step = make_image_train_step(cfg, donate=False)
        st, m = step(state, vgg, content, style)  # trace + compile now
        losses[name] = float(m["loss"])
        steps[name] = step
    os.environ.pop(args.env, None)
    print("one-step losses:", {k: f"{v:.6g}" for k, v in losses.items()},
          flush=True)

    results = {name: [] for name in steps}
    for r in range(args.rounds):
        for name, step in steps.items():
            st = state
            t0 = time.perf_counter()
            for _ in range(args.steps):
                st, m = step(st, vgg, content, style)
            _ = float(m["loss"])
            results[name].append((time.perf_counter() - t0) / args.steps)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1] * 1e3:.1f}ms" for n in steps), flush=True)

    print("\nmedians (ms/step):")
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"  {name}: {ts[len(ts) // 2] * 1e3:7.1f}  "
              f"(min {ts[0] * 1e3:.1f}, max {ts[-1] * 1e3:.1f})")


if __name__ == "__main__":
    main()
