"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json [B]): velocity fields/sec/chip for the 2D smoke
generator at the reference's 128x96 resolution (the inference-sweep hot
loop, SURVEY.md §3.2).  `vs_baseline` is measured against a live proxy of
the reference's TF1-CPU setting: the SAME decoder run at batch 1 on CPU in
a subprocess (the reference swept parameters one sess.run at a time on
host, SURVEY §3.2 [M]); the [B] north-star target is ≥50x.

Usage: python bench.py          (runs on the default backend — the TPU chip)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 512    # chunk width of the device-side scanned sweep
CHUNKS = 16    # scan length: one RPC covers CHUNKS*BATCH fields
WARMUP = 2
ITERS = 5
CPU_ITERS = 8      # batch-1 forwards per CPU measurement window
CPU_WINDOWS = 5    # windows; the MEDIAN window rate is the baseline (the
                   # r01->r02 vs_baseline swing was a single contended CPU
                   # window, not a device change — see VERDICT r2 weak #1)

# Pinned nominal CPU-proxy rate (fields/s): the best-of-rounds median from
# an idle machine (round 2: device 7806.4 / vs 994.5 -> 7.85 fields/s;
# recorded in BASELINE.md "pinned CPU proxy").  `vs_baseline_pinned`
# divides by THIS constant so round-over-round deltas reflect the device,
# not whoever else is time-sharing the host CPU during the live proxy
# windows (the live `vs_baseline` swung 994.5x-1697.7x across rounds while
# the device rate moved +-0.3% — VERDICT r3 weak #1).
CPU_RATE_PINNED = 7.85


def _measure(fn, args, iters, warmup):
    """Wall time per call, forcing a host fetch of a scalar EVERY call.

    Through the axon tunnel, `block_until_ready` returns before the
    computation actually runs (measured: 0.08 ms/"blocked" call vs 38 ms
    real); only fetching result bytes to host forces execution.  `fn` must
    return a scalar that depends on the full output (e.g. its sum) so the
    4-byte fetch serializes the real compute without paying field-sized
    transfers.
    """
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def run_device_bench() -> float:
    """Device-side scanned-sweep inference fields/sec (the production path:
    infer.sweep.sweep_on_device — whole parameter grid in one program)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, (params, _) = ge.entry()

    @jax.jit
    def jfn(params, chunks):
        def step(c, p):
            return c + jnp.sum(fn(params, p)), None
        s, _ = jax.lax.scan(step, jnp.float32(0), chunks)
        return s

    chunks = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(CHUNKS, BATCH, 3)).astype(np.float32))
    dt = _measure(jfn, (params, chunks), ITERS, WARMUP)
    return CHUNKS * BATCH / dt


def run_cpu_baseline() -> list[float]:
    """Batch-1 CPU fields/sec (TF1-CPU reference proxy) in a subprocess.

    Returns CPU_WINDOWS per-window rates from one subprocess (compile paid
    once); callers take the median, which is robust to another process
    time-sharing the machine during individual windows."""
    code = (
        # The axon plugin ignores the JAX_PLATFORMS env var; the config
        # update is what actually selects the CPU backend.
        "import json,time,numpy as np,jax,jax.numpy as jnp;"
        "jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as ge;"
        "fn,(params,_)=ge.entry();"
        "jfn=jax.jit(lambda pa,p: jnp.sum(fn(pa,p)));"
        "p=jnp.zeros((1,3));"
        "[float(jfn(params,p)) for _ in range(2)];"
        f"n={CPU_ITERS};rates=[]\n"
        f"for _ in range({CPU_WINDOWS}):\n"
        "    t0=time.perf_counter()\n"
        "    [float(jfn(params,p)) for _ in range(n)]\n"
        "    rates.append(n/(time.perf_counter()-t0))\n"
        "print('CPURATES', json.dumps(rates))"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CPURATES"):
            return json.loads(line.split(None, 1)[1])
    raise RuntimeError(f"cpu baseline failed: {out.stderr[-800:]}")


def main():
    # Bound the whole bench: during a device-runtime outage, backend init
    # can HANG indefinitely (observed: multi-hour axon outage, children
    # blocked in init) — better one clear failure line than a silent hang.
    import threading

    budget = float(os.environ.get("BENCH_TIMEOUT_SECS", "2400"))

    def _abort():
        print(f"bench: no result within {budget:.0f}s — device runtime "
              "likely down (backend init hang)", file=sys.stderr)
        os._exit(3)

    killer = threading.Timer(budget, _abort)
    killer.daemon = True
    killer.start()

    fields_per_sec = run_device_bench()
    killer.cancel()
    try:
        cpu_rates = sorted(run_cpu_baseline())
        cpu_rate = float(np.median(cpu_rates))
        vs = fields_per_sec / cpu_rate
    except Exception:
        cpu_rates, cpu_rate, vs = [], None, float("nan")
    try:
        load1 = round(os.getloadavg()[0], 1)  # contention context for the
    except OSError:                           # CPU-proxy number
        load1 = None
    print(json.dumps({
        "metric": "2d_velocity_fields_per_sec_per_chip",
        "value": round(fields_per_sec, 1),
        "unit": "fields/s (128x96, scanned sweep 16x512, curl applied)",
        "vs_baseline": round(vs, 1) if vs == vs else None,
        "vs_baseline_pinned": round(fields_per_sec / CPU_RATE_PINNED, 1),
        "cpu_rate_pinned": CPU_RATE_PINNED,
        "device_rate": round(fields_per_sec, 1),
        "cpu_rate_median": round(cpu_rate, 2) if cpu_rate else None,
        "cpu_rates": [round(r, 2) for r in cpu_rates],
        "loadavg_1m": load1,
    }))


if __name__ == "__main__":
    main()
