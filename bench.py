#!/usr/bin/env python
"""Headline benchmark: end-to-end utterances/sec/chip, mel -> CNN-BiLSTM score.

Measures the BASELINE.json north-star unit — a batch of 2-s 16 kHz waveforms
through log-mel (on-device GEMM chain) + the CNN-BiLSTM hybrid to spoof
scores — with device-resident input batches. (In this harness the TPU sits
behind a network tunnel whose ~20 MB/s host->device path is an environment
artifact, not chip performance; a production input pipeline streams and
double-buffers uploads behind compute.)

Baseline: the reference's fused evaluation throughput, 2066 utterances in
10.27 s ≈ 201 utt/s (ASV_deep_learning.ipynb cell 25; BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "utt/s", "vs_baseline": N}
"""

import json
import time

import numpy as np

BASELINE_UTT_PER_SEC = 201.17  # 2066 utterances / 10.27 s (reference eval)

METRIC = "e2e_mel_cnn_bilstm_score_throughput"


def _error_line(reason: str, detail: str) -> str:
    """One machine-readable line so the driver's record stays parseable even
    when the run fails (round 3: a TPU-tunnel outage produced a raw traceback
    and the driver recorded ``parsed: null``)."""
    return json.dumps(
        {
            "metric": METRIC,
            "value": None,
            "unit": "utt/s",
            "vs_baseline": None,
            "error": detail[:500],
            "reason": reason,
        }
    )


def _init_backend_or_die(timeout_s: float = 300.0) -> None:
    """Prove the backend is ALIVE (tiny compute + 1-element fetch) under a
    watchdog thread.

    On a dead axon tunnel the plugin connects lazily: ``jax.devices()``
    returns instantly and the hang happens at the first device OPERATION
    (measured with the pool IP pointed at an unroutable address), and it
    hangs instead of raising — a plain try/except can't catch it (observed
    round 3: rc=1/rc=124 driver artifacts with unparseable output). So the
    probe must execute real device work, in a daemon thread, and emit the
    one-line error JSON if it neither completes nor raises in ``timeout_s``
    (generous: first compile of even a trivial program can take minutes on
    a degraded tunnel).
    """
    import os
    import sys
    import threading

    box: dict = {}

    def probe() -> None:
        try:
            import jax
            import jax.numpy as jnp

            box["n"] = len(jax.devices())
            one = jax.jit(lambda a, b: a + b)(jnp.ones(()), jnp.ones(()))
            box["ok"] = float(one) == 2.0  # host fetch forces execution
        except Exception as e:  # noqa: BLE001 - report any init failure
            box["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(_error_line(
            "backend-unavailable",
            f"device liveness probe hung > {timeout_s:.0f}s (dead tunnel?)",
        ))
        sys.stdout.flush()
        os._exit(1)  # the probe thread is wedged in native code; exit hard
    if "err" in box:
        print(_error_line("backend-unavailable", box["err"]))
        sys.stdout.flush()
        raise SystemExit(1)


def _arm_deadline_reaper(deadline_s: float) -> None:
    """Backstop for mid-run stalls (tunnel dying DURING the benchmark): a
    daemon thread that, if the process is still running after ``deadline_s``,
    prints the one-line error JSON and hard-exits so the driver records a
    parseable artifact instead of a bare rc=124. Override via
    ``AAD_BENCH_DEADLINE_S``."""
    import os
    import threading

    def reap() -> None:
        print(_error_line(
            "backend-stalled", f"benchmark exceeded {deadline_s:.0f}s deadline"
        ), flush=True)
        os._exit(1)

    t = threading.Timer(deadline_s, reap)
    t.daemon = True
    t.start()


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.frontend.mel import MelConfig
    from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
    from audioanalysisdetector_tpu.score.e2e import make_mel_cnn_bilstm_scorer

    sr, seconds = 16000, 2
    batch = 8192
    n_iters = 40  # amortizes the tunnel's ~69 ms scalar-fetch latency to <2%

    rng = np.random.default_rng(0)
    wav_host = (rng.standard_normal((batch, sr * seconds)) * 0.1).astype(np.float32)

    mel_cfg = MelConfig(sr=sr, n_mels=64)
    model = CNNBiLSTMHybrid()
    feats0 = jnp.zeros((1, mel_cfg.n_mels, 1 + sr * seconds // mel_cfg.hop_length))
    variables = model.init(jax.random.PRNGKey(0), feats0, train=False)
    scorer = make_mel_cnn_bilstm_scorer(model.apply, variables, mel_cfg)

    wav = jax.device_put(jnp.asarray(wav_host))

    # warm-up / compile; force materialization with a host fetch (on some
    # remote TPU runtimes block_until_ready does not actually block)
    scores = scorer(wav)
    assert scores.shape == (batch,) and bool(np.isfinite(np.asarray(scores)).all())

    # chained iterations: each dispatch takes the previous accumulator as an
    # INPUT, so program i cannot start before program i-1's output exists,
    # and the final scalar fetch forces the whole chain — dispatch-only
    # timing is impossible by construction. The accumulator feeds only the
    # output-side reduction (threading it into the waveform would add an
    # artificial full-batch copy per iteration). The whole iteration is ONE
    # jitted dispatch so per-call tunnel RPC overhead doesn't pollute the
    # measurement.
    from audioanalysisdetector_tpu.score.e2e import melspec_features

    def chained_step(wav, acc):
        feats = melspec_features(wav, mel_cfg)
        out = model.apply(variables, feats, train=False).reshape(-1)
        return acc + jnp.sum(out)

    chained = jax.jit(chained_step)
    acc = jnp.zeros((), jnp.float32)
    acc = chained(wav, acc)  # compile
    float(acc)

    # FLOPs accounting for the MFU line: ask XLA's cost model for the
    # compiled program's flop count (exact for the GEMM-dominated graph);
    # fall back to the hand arithmetic in benchmarks/README.md if the
    # plugin doesn't expose cost_analysis.
    flops_per_utt, flops_source = 537e6, "analytic (benchmarks/README.md)"
    try:
        ca = chained.lower(wav, acc).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and ca.get("flops"):
            flops_per_utt = float(ca["flops"]) / batch
            flops_source = "xla_cost_analysis"
    except Exception:  # noqa: BLE001 — cost model is informational
        pass

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(n_iters):
        acc = chained(wav, acc)
    float(acc)
    dt = time.perf_counter() - t0
    utt_per_sec = batch * n_iters / dt

    # second lane: the production speech front-end profile (32 ms window /
    # 16 ms hop — MelConfig.for_speech). The headline above keeps librosa's
    # 2048-point default as the parity contract; this lane is the same
    # model on the profile a 16 kHz deployment would actually run
    # (quality-parity evidence: docs/QUALITY.md).
    sp_cfg = MelConfig.for_speech(sr=sr, n_mels=64)
    sp_model = CNNBiLSTMHybrid()
    sp_feats0 = jnp.zeros((1, sp_cfg.n_mels, 1 + sr * seconds // sp_cfg.hop_length))
    sp_vars = sp_model.init(jax.random.PRNGKey(0), sp_feats0, train=False)

    def chained_step_speech(wav, acc):
        feats = melspec_features(wav, sp_cfg)
        out = sp_model.apply(sp_vars, feats, train=False).reshape(-1)
        return acc + jnp.sum(out)

    chained_sp = jax.jit(chained_step_speech)
    acc = chained_sp(wav, jnp.zeros((), jnp.float32))  # compile
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(n_iters):
        acc = chained_sp(wav, acc)
    float(acc)
    sp_utt_per_sec = batch * n_iters / (time.perf_counter() - t0)

    # ---- self-certifying north-star terms (round-4 verdict #6) ----
    # (a) MFU: model flops x measured rate vs this platform's OBSERVED f32
    # GEMM ceiling (~130 TFLOP/s measured on this chip — see
    # benchmarks/README.md; override via AAD_F32_PEAK_TFLOPS for other
    # parts). The matmul-DFT front end is f32 by platform necessity (FFT
    # unimplemented; bf16 GEMMs measured SLOWER here), so f32 peak is the
    # honest denominator.
    f32_peak_tflops = float(os.environ.get("AAD_F32_PEAK_TFLOPS", "130"))
    tflops = flops_per_utt * utt_per_sec / 1e12
    # (b) decode-inclusive projection: measure the native FLAC decoder's
    # per-core cost RIGHT HERE (small in-repo-encoder corpus, CPU-seconds
    # per utterance), then compose: a deployment host feeding this chip
    # spends ceil(chip_rate / decode_rate_per_core) cores on decode; the
    # projection is chip-bound when the provisioned host (default: a v5e
    # host's 24 cores, minus 2 reserved for serving/IO) can feed it.
    decode_us = None
    try:
        decode_us = _measure_decode_us_per_utt(sr=sr, seconds=seconds)
    except Exception:  # noqa: BLE001 — decode probe is informational
        pass
    host_cores = int(os.environ.get("AAD_HOST_CORES", "24"))
    decode_cores = max(1, host_cores - 2)
    line = {
        "metric": METRIC,
        "value": round(utt_per_sec, 1),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "speech_profile_utt_s": round(sp_utt_per_sec, 1),
        "speech_profile_vs_baseline": round(
            sp_utt_per_sec / BASELINE_UTT_PER_SEC, 2
        ),
        "model_flops_per_utt": round(flops_per_utt),
        "flops_source": flops_source,
        "tflops": round(tflops, 1),
        "mfu_vs_f32_peak": round(tflops / f32_peak_tflops, 3),
    }
    if decode_us is not None:
        per_core_rate = 1e6 / decode_us
        line.update({
            "decode_us_per_utt_core": round(decode_us, 1),
            "decode_cores_for_chip_rate": int(
                np.ceil(utt_per_sec / per_core_rate)
            ),
            "projected_decode_inclusive_utt_s": round(
                min(utt_per_sec, decode_cores * per_core_rate), 1
            ),
            "host_cores_assumed": host_cores,
        })
    print(json.dumps(line))


def _measure_decode_us_per_utt(*, sr: int, seconds: int, n_files: int = 48) -> float:
    """CPU-microseconds per utterance for native FLAC decode, measured on a
    small in-repo-encoder corpus (same content recipe as
    benchmarks/bench_decode_scaling.py, smaller N so the headline bench
    stays fast). time.process_time sums CPU across loader threads, so the
    number is per-CORE cost."""
    import tempfile

    from audioanalysisdetector_tpu.io.flac import write_flac
    from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

    n = sr * seconds
    t = np.arange(n) / sr
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="bench_dec_") as root:
        paths = []
        for i in range(n_files):
            y = (
                0.3 * np.sin(2 * np.pi * (110 + 5 * (i % 50)) * t)
                + 0.1 * np.sin(2 * np.pi * (800 + 20 * (i % 30)) * t)
                + 0.03 * rng.standard_normal(n)
            )
            x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
            p = f"{root}/f{i:05d}.flac"
            write_flac(p, x, sr)
            paths.append(p)
        starts, ends = [0.0] * n_files, [float(seconds)] * n_files
        load_chunk_batch_native(paths, starts, ends, sr=sr, n_threads=1)  # warm
        best = float("inf")
        for _ in range(4):
            c0 = time.process_time()
            load_chunk_batch_native(paths, starts, ends, sr=sr, n_threads=1)
            best = min(best, (time.process_time() - c0) / n_files * 1e6)
    return best


if __name__ == "__main__":
    import os
    import sys
    import traceback

    _arm_deadline_reaper(float(os.environ.get("AAD_BENCH_DEADLINE_S", "2400")))
    _init_backend_or_die()
    try:
        main()
    except Exception as e:  # noqa: BLE001 - driver needs a parseable line
        traceback.print_exc()
        print(_error_line("benchmark-error", f"{type(e).__name__}: {e}"))
        sys.exit(1)
