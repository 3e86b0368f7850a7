"""Corruption fuzz over the host decode layer (FLAC + WAV, Python + native).

The targeted corruption tests (test_flac.py / test_native_loader.py) hit
specific frame positions; this sweep flips single bytes at seeded random
offsets across the whole stream and asserts the decoders never crash,
hang, or silently return garbage lengths — every mutation either decodes
(CRC-protected regions that happen to be unused padding / resynced past)
or fails CLEANLY (FlacError for Python, status flag for the native batch
loader). A from-scratch codec earns trust exactly here.
"""

import numpy as np
import pytest

from audioanalysisdetector_tpu.io.flac import FlacError, decode_flac, write_flac
from audioanalysisdetector_tpu.io.native_loader import (
    load_chunk_batch_native,
    native_available,
)

SR = 16000
SECONDS = 2


@pytest.fixture(scope="module")
def flac_bytes(tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(7)
    # tonal + noise content so the encoder exercises LPC and verbatim-ish
    # partitions rather than constant subframes
    t = np.arange(SR * SECONDS) / SR
    y = 0.4 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.standard_normal(len(t))
    x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
    path = str(root / "clean.flac")
    write_flac(path, x, SR)
    clean, _info = decode_flac(path)
    return root, open(path, "rb").read(), np.asarray(clean).reshape(-1)


def _mutated(raw: bytes, offset: int, xor: int) -> bytes:
    b = bytearray(raw)
    b[offset] ^= xor
    return bytes(b)


def test_python_decoder_fuzz(flac_bytes):
    root, raw, clean = flac_bytes
    rng = np.random.default_rng(0)
    decoded = failed = 0
    for i in range(120):
        off = int(rng.integers(0, len(raw)))
        xor = int(rng.integers(1, 256))
        p = str(root / f"mut_{i}.flac")
        with open(p, "wb") as f:
            f.write(_mutated(raw, off, xor))
        try:
            out, info = decode_flac(p)
            decoded += 1
            # a successful decode must deliver every declared sample
            # (n_samples is axis 0; axis -1 is channels)
            assert info.total_samples == 0 or out.shape[0] == info.total_samples
        except FlacError:
            failed += 1
    assert decoded + failed == 120
    assert failed > 0  # CRC/header flips must be caught, not decoded over

    # deterministic benign mutation so the success path is ALWAYS
    # exercised (random flips almost always land in CRC-protected bytes):
    # STREAMINFO's MD5 field (bytes 26..41) is ignored by the decoder
    p = str(root / "mut_md5.flac")
    with open(p, "wb") as f:
        f.write(_mutated(raw, 30, 0xFF))
    out, info = decode_flac(p)
    assert out.shape[0] == info.total_samples == clean.shape[0]
    assert np.array_equal(out.reshape(-1), clean)


def test_python_decoder_truncation_fuzz(flac_bytes):
    root, raw, clean = flac_bytes
    rng = np.random.default_rng(2)
    for i in range(40):
        cut = int(rng.integers(0, len(raw)))
        p = str(root / f"trunc_{i}.flac")
        with open(p, "wb") as f:
            f.write(raw[:cut])
        with pytest.raises(FlacError):
            decode_flac(p)


@pytest.mark.skipif(not native_available(), reason="no native loader")
def test_native_decoder_fuzz_matches_python_verdicts(flac_bytes):
    root, raw, clean = flac_bytes
    rng = np.random.default_rng(1)
    paths, offs = [], []
    for i in range(120):
        off = int(rng.integers(0, len(raw)))
        xor = int(rng.integers(1, 256))
        p = str(root / f"nmut_{i}.flac")
        with open(p, "wb") as f:
            f.write(_mutated(raw, off, xor))
        paths.append(p)
        offs.append(off)
    out, ok = load_chunk_batch_native(
        paths, [0.0] * len(paths), [float(SECONDS)] * len(paths),
        sr=SR, return_ok=True,
    )
    assert out.shape == (len(paths), SR * SECONDS)
    assert np.isfinite(out).all()
    assert ok.sum() > 0 and (~ok).sum() > 0
    # rows that claim success must be sample-exact wherever the stream
    # decoded (corruption inside one frame may zero that frame's span but
    # must never smear garbage into rows flagged ok with wrong scale)
    assert np.abs(out[ok]).max() <= 1.0


def test_wav_fuzz_error_contract(tmp_path):
    """WAV has no CRC, so corruption can't always be *detected* — the
    contract is that ``load_audio`` either decodes or raises one of the
    exception types every caller catches (chunk_rows, the native loader's
    Python fallback), never an unhandled type, and the native batch loader
    never crashes and always returns in-range floats on ok rows."""
    import wave as wave_mod

    from audioanalysisdetector_tpu.io.audio import load_audio, write_wav

    rng = np.random.default_rng(3)
    t = np.arange(SR * SECONDS) / SR
    clean_path = str(tmp_path / "clean.wav")
    write_wav(clean_path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)
    raw = open(clean_path, "rb").read()

    allowed = (RuntimeError, OSError, EOFError, ValueError, wave_mod.Error)
    paths = []
    for i in range(120):
        kind = i % 3
        if kind == 0:  # byte flip
            mut = _mutated(raw, int(rng.integers(0, len(raw))), int(rng.integers(1, 256)))
        elif kind == 1:  # truncation
            mut = raw[: int(rng.integers(0, len(raw)))]
        else:  # header-area flip (chunk sizes, fmt fields)
            mut = _mutated(raw, int(rng.integers(0, min(64, len(raw)))), int(rng.integers(1, 256)))
        p = str(tmp_path / f"wmut_{i}.wav")
        with open(p, "wb") as f:
            f.write(mut)
        paths.append(p)
        try:
            y, sr_out = load_audio(p)
            assert y.dtype == np.float32
        except allowed:
            pass

    if native_available():
        out, ok = load_chunk_batch_native(
            paths, [0.0] * len(paths), [float(SECONDS)] * len(paths),
            sr=SR, return_ok=True,
        )
        assert out.shape == (len(paths), SR * SECONDS)
        assert np.isfinite(out).all()


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_native_rice_hot_loop_edge_streams(tmp_path):
    """Targeted edges for the round-5 Rice hot loop (native/flacdec.cpp
    rice_decode_run): (a) isolated huge spikes -> very long unary quotients
    (the long-zero-run slow path and the t==64 shift guard), (b) near-
    constant signal -> tiny params / quotient-dominated codewords, (c) a
    dense alternating extreme signal -> escape/verbatim-ish partitions.
    Native output must match the portable Python decoder bit-for-bit."""
    rng = np.random.default_rng(11)
    n = SR * SECONDS
    signals = {
        # one enormous residual outlier per frame region: the encoder's
        # single-partition param stays small, so the spike's quotient is a
        # multi-hundred-bit unary run
        "spikes": np.where(
            np.arange(n) % 4099 == 0, 30000, (rng.integers(-3, 4, n))
        ).astype(np.int64),
        "near_constant": (np.ones(n) * 5 + rng.integers(0, 2, n)).astype(np.int64),
        "extreme_alt": (np.tile([32700, -32700], n // 2)[:n]
                        + rng.integers(-5, 6, n)).astype(np.int64),
    }
    for name, x in signals.items():
        path = str(tmp_path / f"{name}.flac")
        write_flac(path, x, SR)
        py, info = decode_flac(path)  # (n, channels) int32, unscaled
        ref = (
            np.asarray(py, np.float32).reshape(-1)[:n]
            / float(1 << (info.bits_per_sample - 1))
        )
        nat = load_chunk_batch_native([path], [0.0], [float(SECONDS)], sr=SR)
        np.testing.assert_array_equal(ref, nat[0][:n], err_msg=name)
