"""Op-level profile of the bench train step: top XLA ops by device self-time.

Captures a jax.profiler trace of `train_steps_scan` on the current backend
and parses the xplane proto directly (tensorflow's xplane_pb2 is in the
image), printing the top-N ops aggregated by name — the data behind the
roofline/fusion decisions (BASELINE.md).

Run:  python scripts/op_profile.py [--iters 8] [--top 30] [--superset_P 32]
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import collections
import glob
import json
import sys
import tempfile


def parse_xplanes(logdir: str, top: int):
    try:  # proto location moved across TF releases
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    totals = collections.Counter()
    counts = collections.Counter()
    device_total_ps = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            pname = plane.name.lower()
            if not ("tpu" in pname or "device" in pname or "gpu" in pname):
                continue
            if "host" in pname:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            # Pick the finest-granularity line: an "xla ops" line if present,
            # else the line with the most events (module-level lines have one
            # event per dispatch and would swallow the whole scan as one op).
            best = None
            for line in plane.lines:
                lname = line.name.lower()
                if "xla op" in lname or "xla_op" in lname:
                    best = line
                    break
                if best is None or len(line.events) > len(best.events):
                    best = line
            if best is None:
                continue
            for ev in best.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
                device_total_ps += ev.duration_ps
    rows = []
    for name, ps in totals.most_common(top):
        rows.append({"op": name[:110], "ms_total": round(ps / 1e9, 2),
                     "calls": counts[name],
                     "pct": round(100.0 * ps / max(device_total_ps, 1), 1)})
    return rows, device_total_ps / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--superset_P", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.train import trainer

    import math
    rss = int(math.isqrt(args.rays))
    over = {"random_sample_size": rss}
    if args.superset_P is not None:
        over["superset_P"] = args.superset_P
    opt, state, spec, grid, ts, batch = make_workload(**over)
    S = args.iters
    key0 = jax.random.PRNGKey(7)
    batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim")
                   else jnp.full((S,), v, jnp.float32))
               for k, v in batch.items()}
    # compile + warm
    ts2, items = trainer.train_steps_scan(ts, grid, batches, key0, opt, spec)
    float(items["loss_total"][-1])

    logdir = tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(logdir):
        ts2, items = trainer.train_steps_scan(ts, grid, batches, key0, opt,
                                              spec)
        float(items["loss_total"][-1])

    rows, total_s = parse_xplanes(logdir, args.top)
    print(json.dumps({"device_busy_s_total": round(total_s, 3),
                      "iters_traced": S,
                      "per_iter_ms": round(total_s / S * 1000.0, 2)}))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
