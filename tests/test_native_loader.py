"""Native C++ WAV loader: build, parity with the Python loader, fallbacks."""

import numpy as np
import pytest

from audioanalysisdetector_tpu.io.audio import audio_info, load_chunk_batch, write_wav
from audioanalysisdetector_tpu.io.native_loader import (
    audio_info_native,
    load_chunk_batch_native,
    native_available,
)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        y = np.clip(rng.standard_normal(16000 * 3) * 0.2, -0.99, 0.99).astype(np.float32)
        p = str(d / f"f{i}.wav")
        write_wav(p, y, 16000)
        paths.append(p)
    # one file at a different sample rate (native must flag + fall back)
    p8k = str(d / "f8k.wav")
    write_wav(p8k, np.zeros(8000, np.float32) + 0.1, 8000)
    paths.append(p8k)
    return paths


def test_native_builds():
    assert native_available(), "g++ build of native/wavloader.cpp failed"


def test_native_info_matches_python(wavs):
    info_py = audio_info(wavs[0])
    info_c = audio_info_native(wavs[0])
    assert info_c is not None
    assert (info_c.frames, info_c.samplerate, info_c.channels) == (
        info_py.frames, info_py.samplerate, info_py.channels,
    )


def test_native_batch_matches_python_loader(wavs):
    paths = wavs[:5]
    starts = [0.0, 1.0, 0.5, 0.0, 2.0]
    ends = [2.0, 3.0, 2.5, 2.0, 4.0]
    ref = load_chunk_batch(paths, starts, ends, sr=16000)
    out = load_chunk_batch_native(paths, starts, ends, sr=16000)
    assert out.shape == ref.shape == (5, 32000)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_rate_mismatch_falls_back(wavs):
    # the 8 kHz file must be resampled via the Python path, not zero-filled
    out = load_chunk_batch_native([wavs[-1]], [0.0], [0.5], sr=16000)
    assert out.shape == (1, 8000)
    assert np.abs(out).max() > 0.05


def test_native_missing_file_leaves_zeros(wavs):
    out = load_chunk_batch_native(
        [wavs[0], "/nonexistent/x.wav"], [0.0, 0.0], [1.0, 1.0], sr=16000
    )
    assert np.abs(out[0]).max() > 0
    assert (out[1] == 0).all()


def test_native_short_read_zero_pads(wavs):
    # request past EOF: tail stays zero
    out = load_chunk_batch_native([wavs[0]], [2.5], [4.5], sr=16000)
    assert (out[0, 8000:] == 0).all()
    assert np.abs(out[0, :8000]).max() > 0


@pytest.fixture(scope="module")
def flacs(tmp_path_factory):
    from audioanalysisdetector_tpu.io.flac import write_flac

    d = tmp_path_factory.mktemp("flacs")
    rng = np.random.default_rng(1)
    paths = []
    modes = ["auto", "verbatim", "fixed", "lpc"]
    for i, mode in enumerate(modes):
        t = np.arange(16000 * 3) / 16000.0
        y = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t) + rng.normal(0, 0.005, t.size)
        x = np.round(np.clip(y, -0.99, 0.99) * 32767).astype(np.int64)
        p = str(d / f"f{i}_{mode}.flac")
        write_flac(p, x, 16000, subframe_mode=mode)
        paths.append(p)
    st = np.round(
        rng.normal(0, 2000, (8000, 2)).cumsum(axis=0).clip(-30000, 30000) / 4
    ).astype(np.int64)
    p = str(d / "stereo_ms.flac")
    write_flac(p, st, 16000, stereo_mode="mid_side", rice_partition_order=2)
    paths.append(p)
    return paths


def test_native_flac_info_matches_python(flacs):
    for p in flacs:
        info_py = audio_info(p)
        info_c = audio_info_native(p)
        assert info_c is not None, p
        assert (info_c.frames, info_c.samplerate, info_c.channels) == (
            info_py.frames, info_py.samplerate, info_py.channels,
        ), p


def test_native_flac_batch_matches_python_decoder(flacs):
    starts = [0.0, 1.0, 0.5, 0.0, 0.0]
    ends = [2.0, 3.0, 2.5, 2.0, 0.5]
    ref = load_chunk_batch(flacs, starts, ends, sr=16000)
    out = load_chunk_batch_native(flacs, starts, ends, sr=16000)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_flac_corrupt_falls_back_then_flags(flacs, tmp_path):
    raw = bytearray(open(flacs[0], "rb").read())
    raw[100] ^= 0xFF  # inside the first frame (metadata ends around byte 46)
    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(bytes(raw))
    out, ok = load_chunk_batch_native(
        [flacs[0], bad], [0.0, 0.0], [1.0, 1.0], sr=16000, return_ok=True
    )
    assert ok[0] and np.abs(out[0]).max() > 0
    # native rejects -> Python fallback also raises -> row flagged not-ok
    assert not ok[1]


def test_native_flac_grouped_multichunk_matches_singles(flacs, tmp_path):
    """Repeated-path FLAC rows take the one-span-decode group path.

    The loader decodes a multi-chunk FLAC file once per batch and slices
    rows out of the span (FLAC has no frame seek, so per-chunk decode
    replays the prefix). Must be bit-identical to per-chunk decodes,
    including a chunk starting past EOF (zero row) and interleaved order.
    """
    from audioanalysisdetector_tpu.io.flac import write_flac

    rng = np.random.default_rng(7)
    n = int(16000 * 6.5)
    t = np.arange(n) / 16000.0
    y = 0.3 * np.sin(2 * np.pi * 140 * t) + 0.05 * rng.standard_normal(n)
    x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
    p = str(tmp_path / "long.flac")
    write_flac(p, x, 16000)

    paths = [p, flacs[0], p, p, p]  # interleaved: group is non-contiguous
    starts = [0.0, 0.0, 2.0, 4.0, 6.0]  # 6.0 -> only 0.5 s available
    ends = [s + 2.0 for s in starts]
    grouped, ok = load_chunk_batch_native(paths, starts, ends, sr=16000, return_ok=True)
    assert ok.all()
    singles = np.stack([
        load_chunk_batch_native([pp], [s], [e], sr=16000)[0]
        for pp, s, e in zip(paths, starts, ends)
    ])
    np.testing.assert_array_equal(grouped, singles)
    assert (grouped[4, 8000:] == 0).all()  # past-EOF tail zero-padded


def test_native_flac_grouped_corrupt_file_flags_all_rows(flacs, tmp_path):
    raw = bytearray(open(flacs[0], "rb").read())
    raw[100] ^= 0xFF
    bad = str(tmp_path / "bad2.flac")
    with open(bad, "wb") as f:
        f.write(bytes(raw))
    out, ok = load_chunk_batch_native(
        [bad, flacs[1], bad], [0.0, 0.0, 1.0], [1.0, 1.0, 2.0],
        sr=16000, return_ok=True,
    )
    assert not ok[0] and not ok[2]
    assert ok[1] and np.abs(out[1]).max() > 0


def test_native_flac_grouped_midfile_corruption_matches_singles(tmp_path):
    """Mid-stream corruption: the span decode succeeds partially; chunks
    after the bad frame must NOT become silent all-zero ok rows — grouped
    status/audio must match the per-chunk decode exactly (which flags
    fully-after-failure chunks, triggering the Python-fallback->drop path).
    """
    from audioanalysisdetector_tpu.io.flac import write_flac

    rng = np.random.default_rng(11)
    n = 16000 * 6
    t = np.arange(n) / 16000.0
    y = 0.3 * np.sin(2 * np.pi * 150 * t) + 0.05 * rng.standard_normal(n)
    x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
    p = str(tmp_path / "mid.flac")
    write_flac(p, x, 16000)
    raw = bytearray(open(p, "rb").read())
    raw[int(len(raw) * 0.55)] ^= 0xFF  # corrupt a frame ~60% in
    with open(p, "wb") as f:
        f.write(bytes(raw))

    paths, starts = [p, p, p], [0.0, 2.0, 4.0]
    ends = [s + 2.0 for s in starts]
    grouped, g_ok = load_chunk_batch_native(paths, starts, ends, sr=16000, return_ok=True)
    singles, s_ok = [], []
    for pp, s, e in zip(paths, starts, ends):
        r, o = load_chunk_batch_native([pp], [s], [e], sr=16000, return_ok=True)
        singles.append(r[0])
        s_ok.append(o[0])
    np.testing.assert_array_equal(g_ok, np.asarray(s_ok))
    for g, s, o in zip(grouped, singles, s_ok):
        if o:  # failed rows' buffers are fallback-dependent; compare ok rows
            np.testing.assert_array_equal(g, s)
    assert g_ok[0] and not g_ok[2]  # prefix decodes, post-corruption flagged


def test_native_mixed_wav_flac_batch(wavs, flacs):
    paths = [wavs[0], flacs[0], wavs[1], flacs[1]]
    starts = [0.0, 0.0, 1.0, 1.0]
    ends = [1.0, 1.0, 2.0, 2.0]
    ref = load_chunk_batch(paths, starts, ends, sr=16000)
    out = load_chunk_batch_native(paths, starts, ends, sr=16000)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_rejects_sub_byte_bits_per_sample(tmp_path):
    """A fmt chunk claiming bits_per_sample < 8 previously divided by zero
    in the native loader (SIGFPE — whole-process crash); it must flag the
    row and fall through to the Python loader's error instead."""
    import struct

    from audioanalysisdetector_tpu.io.native_loader import (
        audio_info_native,
        load_chunk_batch_native,
    )

    p = str(tmp_path / "bad.wav")
    data = b"\x00" * 64
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 // 2, 0, 4)  # bits=4
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

    assert audio_info_native(p) is None  # native probe rejects, no crash
    # surviving this call IS the regression check (it used to SIGFPE);
    # stdlib wave rounds sampwidth up to 1 byte, so the Python fallback
    # may legitimately decode the zero payload as silence
    out, ok = load_chunk_batch_native([p], [0.0], [2.0], sr=16000, return_ok=True)
    assert out.shape == (1, 32000)
    assert np.isfinite(out).all()
