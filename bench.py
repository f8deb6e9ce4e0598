#!/usr/bin/env python3
"""Headline benchmark: images/sec/chip at 1024² generator forward.

Measures the BASELINE.json metric — batched latent -> uint8 image through the
full progressive generator at 1024² on the attached chip — and compares
against the CPU reference (benchmarks/torch_reference.py, the fp32 torch
implementation that defines the ≥50x denominator per BASELINE.md, since the
reference repo publishes no numbers).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The CPU baseline is measured once and cached in benchmarks/cpu_baseline.json
(keyed by resolution/torch version) because a single 1024² forward takes
O(10 s) on this host's one core.

Env overrides: PROBGAN_BENCH_BATCH, PROBGAN_BENCH_SECONDS, PROBGAN_BENCH_RES,
PROBGAN_BENCH_DTYPE (float32|bfloat16),
PROBGAN_BENCH_PRECISION (default|high|highest — MXU pass count; see below),
PROBGAN_BENCH_KG (auto|1|0 — the N=1M KG ranking leg; auto = TPU only).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

RES = int(os.environ.get("PROBGAN_BENCH_RES", "1024"))
BATCH = int(os.environ.get("PROBGAN_BENCH_BATCH", "8"))  # v5e sweet spot @1024²
# Batches per device call: 32 chained batches ≈ 2.1 s of device work per
# ~34 ms relay RPC, shrinking the per-call tax to ~1.6% (r4 ran CHAIN=8 at
# ~4%; VERDICT r4 #7 asked for the residual to be squeezed or documented).
CHAIN = int(os.environ.get("PROBGAN_BENCH_CHAIN", "32"))
# 30 s window: the relay transport stalls individual calls by 100s of ms a
# few times a minute (observed round 4: a 10 s window measured 98.6 img/s
# mean while p50 held 8.1 ms/img = ~123 img/s; a 30 s window converged to
# 124.0). The mean only represents the chip when the window spans many
# stall events.
SECONDS = float(os.environ.get("PROBGAN_BENCH_SECONDS", "30"))
DTYPE = os.environ.get("PROBGAN_BENCH_DTYPE", "float32")
# Parity-grade MXU precision (3-pass fp32 emulation, ~73 dB vs the CPU
# reference — the >50 dB north-star bar; "default" is ~2.4x faster but lands
# at ~48 dB, below the bar).
PRECISION = os.environ.get("PROBGAN_BENCH_PRECISION", "high")
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "benchmarks", "cpu_baseline.json")
SEED = 7


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Relay outages are a fact of this environment (BENCH_r03 was lost to one:
# "Unable to initialize backend 'axon': UNAVAILABLE" mid-round). Because
# JAX_PLATFORMS=axon makes the TPU backend *required*, a single failed init
# poisons the in-process jax backend cache — so availability is probed in a
# throwaway subprocess, with bounded retry/backoff (~3 min total), before the
# main process ever touches jax.
PROBE_ATTEMPTS = int(os.environ.get("PROBGAN_BENCH_PROBE_ATTEMPTS", "4"))
# A down relay HANGS jax.devices() rather than failing fast (observed both
# round 3 and round 4), so each probe also needs its own timeout.
PROBE_TIMEOUT = float(os.environ.get("PROBGAN_BENCH_PROBE_TIMEOUT", "90"))
PROBE_DELAYS = [0.0, 20.0, 45.0, 75.0]  # cumulative ~2.3 min between probes


def probe_backend() -> bool:
    for i in range(PROBE_ATTEMPTS):
        if i:
            delay = PROBE_DELAYS[min(i, len(PROBE_DELAYS) - 1)]
            log(f"backend probe retry {i + 1}/{PROBE_ATTEMPTS} in {delay:.0f}s")
            time.sleep(delay)
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=PROBE_TIMEOUT,
            )
        except subprocess.TimeoutExpired:
            log(f"backend probe {i + 1}/{PROBE_ATTEMPTS}: timeout (relay hang)")
            continue
        if r.returncode == 0:
            return True
        tail = r.stderr.decode(errors="replace").strip().splitlines()
        log(f"backend probe {i + 1}/{PROBE_ATTEMPTS} failed: "
            f"{tail[-1] if tail else 'no stderr'}")
    return False


def read_cached_cpu_baseline() -> float | None:
    """Cached CPU-reference img/s without initializing any jax backend."""
    try:
        import torch

        key = f"res{RES}_torch{torch.__version__.split('+')[0]}"
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        return float(cache[key])
    except Exception:
        return None


def emit_failure(reason: str, detail: str, partial: dict | None = None) -> None:
    """Machine-readable failure record — the driver artifact is never empty."""
    cpu = read_cached_cpu_baseline()
    result = {
        "metric": f"images_per_sec_chip_{RES}x{RES}_generator_forward",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": reason,
        "error_detail": detail[-500:],
        "cpu_baseline_img_per_sec": round(cpu, 4) if cpu is not None else None,
    }
    if partial:
        result.update(partial)
    print(json.dumps(result))


def measure_cpu_baseline(jax_params, cfg) -> float:
    """images/sec of the fp32 torch CPU reference at RES (cached)."""
    import torch

    key = f"res{RES}_torch{torch.__version__.split('+')[0]}"
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            log(f"cpu baseline (cached): {cache[key]:.4f} img/s")
            return float(cache[key])
    else:
        cache = {}

    from benchmarks import torch_reference as tref

    t_params = tref.convert_params(jax_params)
    stage = cfg.num_stages - 1
    rng = np.random.RandomState(SEED)
    z = torch.from_numpy(rng.standard_normal((1, cfg.latent_dim)).astype(np.float32))

    log("measuring cpu baseline (torch fp32, batch 1)...")
    tref.generator_uint8(t_params, z, cfg.nf(0), stage)  # warmup / allocation
    iters, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < max(SECONDS, 5.0) and iters < 8:
        tref.generator_uint8(t_params, z, cfg.nf(0), stage)
        iters += 1
    ips = iters / (time.perf_counter() - t0)
    cache[key] = ips
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    log(f"cpu baseline (measured): {ips:.4f} img/s over {iters} iters")
    return ips


def main() -> None:
    if not probe_backend():
        emit_failure(
            "backend_unavailable",
            f"axon backend failed to initialize after {PROBE_ATTEMPTS} "
            "probe attempts (~3 min); relay outage",
        )
        return
    partial: dict = {}
    try:
        run_bench(partial)
    except Exception as e:  # noqa: BLE001 — one JSON line beats a stack trace
        import traceback

        traceback.print_exc(file=sys.stderr)
        emit_failure("runtime_failure", f"{type(e).__name__}: {e}", partial)


def run_bench(partial: dict) -> None:
    import jax
    import jax.numpy as jnp

    from probgan_tpu.engine.image import generate_fn
    from probgan_tpu.models import pro_gan

    cfg = pro_gan.ProGANConfig(resolution=RES)
    stage = cfg.num_stages - 1
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32

    log(f"backend={jax.default_backend()} res={RES} batch={BATCH} dtype={DTYPE} "
        f"precision={PRECISION}")
    # Init on the CPU backend: eager per-weight init on the accelerator would
    # trigger one small compile per distinct weight shape (minutes through a
    # remote-compile service); one device_put of the finished pytree is cheap.
    with jax.default_device(jax.devices("cpu")[0]):
        g_params = pro_gan.init_generator(jax.random.key(SEED), cfg)

    cpu_ips = measure_cpu_baseline(g_params, cfg)
    partial["cpu_baseline_img_per_sec"] = round(cpu_ips, 4)

    g_params = jax.device_put(g_params, jax.devices()[0])
    # Pallas uint8 denorm measured 13% SLOWER than letting XLA fuse the
    # denorm into the preceding epilogue (the pallas_call boundary forces the
    # fp32 RGB through HBM); off unless explicitly requested.
    use_pallas = os.environ.get("PROBGAN_PALLAS_UINT8", "0") == "1"
    z = jax.random.normal(jax.random.key(SEED + 1), (BATCH, cfg.latent_dim), jnp.float32)
    alpha = jnp.float32(1.0)

    # Timing sync: block_until_ready can return early through relayed/remote
    # device transports, so each timed call fetches a device-computed int
    # checksum scalar — a hard synchronization with negligible transfer.
    # Each call additionally CHAINS `CHAIN` generator batches through one
    # lax.scan so the host<->device round trip (measured ~34 ms through this
    # environment's relay) amortizes; otherwise the RPC latency, not the
    # chip, is what gets measured.
    z_chain = jax.random.normal(
        jax.random.key(SEED + 1), (CHAIN, BATCH, cfg.latent_dim), jnp.float32
    )

    from probgan_tpu.engine.image import packed_default

    packed = packed_default() and DTYPE == "float32"
    log(f"packed late-stage Pallas path: {packed}")

    @jax.jit
    def gen_checksum(params, latents):
        def step(acc, zb):
            img = generate_fn(
                params, zb, alpha, cfg, stage, dtype, use_pallas, PRECISION,
                packed,
            )
            return acc + jnp.sum(img.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), latents)
        return acc

    log("compiling device graph...")
    t0 = time.perf_counter()
    float(gen_checksum(g_params, z_chain))
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")

    float(gen_checksum(g_params, z_chain))  # warmup

    latencies = []
    images = 0
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < SECONDS:
        t1 = time.perf_counter()
        float(gen_checksum(g_params, z_chain))
        latencies.append(time.perf_counter() - t1)
        images += BATCH * CHAIN
    elapsed = time.perf_counter() - t_start
    ips = images / elapsed
    p50_ms = 1000.0 * float(np.percentile(latencies, 50)) / (BATCH * CHAIN)

    log(f"device: {ips:.2f} img/s, p50 {p50_ms:.2f} ms/img over {len(latencies)} batches")
    # Milestone for the failure record: a crash later (e.g. in the fast-grade
    # compile) still reports the measured headline.
    partial["headline_img_per_sec"] = round(ips, 3)
    partial["headline_vs_baseline"] = round(ips / cpu_ips, 2) if cpu_ips > 0 else None

    # Secondary metric: the "fast" serving grade (cheapest precision mode
    # measured >= 50 dB PSNR vs the parity path; benchmarks/packed_psnr.py
    # verifies the grade). Only measured when the headline runs the default
    # parity configuration, so the extra compile is the only added cost.
    fast_ips = None
    if PRECISION == "high" and packed:
        @jax.jit
        def gen_checksum_fast(params, latents):
            def step(acc, zb):
                img = generate_fn(
                    params, zb, alpha, cfg, stage, dtype, use_pallas, "fast",
                    packed,
                )
                return acc + jnp.sum(img.astype(jnp.int32)), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), latents)
            return acc

        log("compiling fast-grade graph...")
        float(gen_checksum_fast(g_params, z_chain))
        float(gen_checksum_fast(g_params, z_chain))  # warmup
        fimages, flat, t_start = 0, [], time.perf_counter()
        while time.perf_counter() - t_start < min(SECONDS, 15.0):
            t1 = time.perf_counter()
            float(gen_checksum_fast(g_params, z_chain))
            flat.append(time.perf_counter() - t1)
            fimages += BATCH * CHAIN
        fast_ips = fimages / (time.perf_counter() - t_start)
        fast_p50_ms = 1000.0 * float(np.percentile(flat, 50)) / (BATCH * CHAIN)
        log(f"fast grade (>=50 dB): {fast_ips:.2f} img/s")

    # Roofline accounting (VERDICT r1 #10): ideal HBM traffic per image under
    # the packed execution model — each stage's upconv reads act(s-1) and
    # writes act(s); conv2 reads+writes act(s); the final stage writes RGB
    # instead of features. hbm_bw_util = achieved ideal-traffic rate over the
    # v5e's 819 GB/s nominal HBM bandwidth (the measured practical elementwise
    # ceiling through this chip is ~622 GB/s — see benchmarks/RESULTS.md).
    def act_bytes(s):
        r = pro_gan.stage_resolution(s)
        return r * r * cfg.nf(s) * 4

    bytes_per_img = act_bytes(0)
    for s in range(1, stage + 1):
        final = s == stage
        bytes_per_img += act_bytes(s - 1) + act_bytes(s)  # upconv r/w
        bytes_per_img += act_bytes(s)  # conv2 read
        bytes_per_img += (RES * RES * 3 * 4) if final else act_bytes(s)
    hbm_bw_util = ips * bytes_per_img / 819e9
    log(f"ideal traffic {bytes_per_img/1e6:.0f} MB/img -> "
        f"{ips * bytes_per_img / 1e9:.0f} GB/s ({100*hbm_bw_util:.0f}% of "
        f"819 GB/s nominal)")

    result = {
        "metric": f"images_per_sec_chip_{RES}x{RES}_generator_forward",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / cpu_ips, 2) if cpu_ips > 0 else None,
        "p50_ms_per_image_chained": round(p50_ms, 2),
        # Both methodologies ride in the artifact (VERDICT r4 #7): "value"
        # is WALL-CLOCK over the whole window (includes relay stalls — what
        # a user of this tunnel sees); "slope_img_per_sec" is the p50
        # per-call rate (stall-robust — what the chip itself sustains).
        "slope_img_per_sec": round(1000.0 / p50_ms, 3) if p50_ms > 0 else None,
        "hbm_bw_util": round(hbm_bw_util, 3),
    }
    if fast_ips is not None:
        result["fast_grade_img_per_sec"] = round(fast_ips, 3)
        result["fast_grade_vs_baseline"] = (
            round(fast_ips / cpu_ips, 2) if cpu_ips > 0 else None
        )
        result["fast_grade_slope_img_per_sec"] = (
            round(1000.0 / fast_p50_ms, 3) if fast_p50_ms > 0 else None
        )
        # Same ideal-traffic model as the headline (VERDICT r3 #3 asks for
        # the fast grade's utilization too — it is the grade where the chip
        # stops being MXU-pass-bound and bandwidth starts to matter).
        result["fast_grade_hbm_bw_util"] = round(
            fast_ips * bytes_per_img / 819e9, 3
        )

    # KG flagship metric (VERDICT r4 #8): the reference's actual domain is
    # link-prediction ranking; the driver artifact carries its perf too.
    # Generator fwd -> fused normalize/rank matmul -> top-k at N=1M entities
    # (the production fp32 fused path of benchmarks/kg_rank_bench.py).
    # Failure here never voids the image headline above.
    kg_mode = os.environ.get("PROBGAN_BENCH_KG", "auto")
    run_kg = kg_mode == "1" or (
        kg_mode == "auto" and jax.default_backend() == "tpu"
    )  # N=1M is minutes-per-pass on the 1-core CPU backend — chip only
    if run_kg:
        try:
            result.update(measure_kg_rank())
        except Exception as e:  # noqa: BLE001
            log(f"kg rank leg failed (headline unaffected): {e}")
            result["kg_rank_qps_n1m"] = None
            result["kg_rank_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


def measure_kg_rank(n: int = 1_000_000, d: int = 128, z_dim: int = 64,
                    b: int = 64, top_k: int = 10, chain: int = 48,
                    seconds: float = 8.0) -> dict:
    """predict_tails' core at production scale: queries/sec through the
    fused Pallas rank+top-k kernel ([B, N] scores never touch HBM)."""
    import jax
    import jax.numpy as jnp

    from probgan_tpu.engine.inference import _rank_topk
    from probgan_tpu.models import kg_gan
    from probgan_tpu.ops import pallas_rank

    n_pad = -(-n // 2048) * 2048  # rank kernel N tile (ops/pallas_rank.py)
    with jax.default_device(jax.devices("cpu")[0]):
        g_params = kg_gan.init_generator(jax.random.key(SEED), d, z_dim)
        table = np.random.RandomState(SEED).standard_normal((n_pad, d))
        table = table.astype(np.float32)
        table[n:] = 0.0
        table /= np.maximum(np.linalg.norm(table, axis=1, keepdims=True), 1e-12)
    dev = jax.devices()[0]
    g_params = jax.device_put(g_params, dev)
    table_norm = jax.device_put(np.ascontiguousarray(table), dev)
    use_pallas = (
        jax.default_backend() == "tpu" and pallas_rank.supports((b, d), n_pad)
    )
    hc = jax.random.normal(jax.random.key(1), (chain, b, d), jnp.float32)
    rc = jax.random.normal(jax.random.key(2), (chain, b, d), jnp.float32)
    zc = jax.random.normal(jax.random.key(3), (chain, b, z_dim), jnp.float32)

    @jax.jit
    def rank_checksum(g_params, hc, rc, zc, table_norm):
        def step(acc, inputs):
            hh, rr, zz = inputs
            pred = kg_gan.generator_apply(g_params, hh, rr, zz)
            v, i = _rank_topk(pred, table_norm, top_k, n, use_pallas)
            return acc + jnp.sum(i) + jnp.sum(v).astype(jnp.int32), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), (hc, rc, zc))
        return acc

    log(f"compiling kg rank graph (N={n}, pallas={use_pallas})...")
    float(rank_checksum(g_params, hc, rc, zc, table_norm))
    float(rank_checksum(g_params, hc, rc, zc, table_norm))  # warmup
    iters, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        float(rank_checksum(g_params, hc, rc, zc, table_norm))
        iters += 1
    qps = iters * chain * b / (time.perf_counter() - t0)
    log(f"kg rank: {qps:.0f} queries/s @ N={n}")
    return {
        "kg_rank_qps_n1m": round(qps, 1),
        "kg_rank_batch": b,
        "kg_rank_top_k": top_k,
        "kg_rank_pallas": use_pallas,
    }


if __name__ == "__main__":
    main()
