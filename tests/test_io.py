"""IO layer tests: kaldi ark round-trips, exraw, scp parsing, wav, readers."""

import io as _io

import numpy as np
import pytest

from setk_tpu.io import (ArchiveWriter, ArchiveReader, ScriptReader,
                         ExrawWriter, ExrawReader, ExrawScriptReader,
                         NumpyWriter, NumpyReader, WaveReader, WaveWriter,
                         SpectrogramReader, parse_scps, read_wav, write_wav)
from setk_tpu.io import kaldi
from setk_tpu.dsp import StftConfig, forward_stft


def test_kaldi_mat_roundtrip(tmp_path, rng):
    mats = {
        "utt1": rng.standard_normal((13, 7)).astype(np.float32),
        "utt2": rng.standard_normal((5, 9)).astype(np.float64),
        "utt3": rng.standard_normal(11).astype(np.float32),
        "utt4": (rng.standard_normal((4, 6)) +
                 1j * rng.standard_normal((4, 6))).astype(np.complex64),
    }
    ark, scp = str(tmp_path / "a.ark"), str(tmp_path / "a.scp")
    with ArchiveWriter(ark, scp, dtype=None) as writer:
        for k, m in mats.items():
            writer.write(k, m)
    # sequential
    got = dict(ArchiveReader(ark))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    # random access via scp offsets
    reader = ScriptReader(scp)
    for k in ("utt4", "utt2", "utt1", "utt3"):
        np.testing.assert_array_equal(reader[k], mats[k])


def test_kaldi_compressed_read(tmp_path, rng):
    """Decompress CM2/CM3 formats written by hand (uniform quantization)."""
    mat = rng.random((20, 30)).astype(np.float32)
    min_val, prange = float(mat.min()), float(mat.max() - mat.min())
    q = np.round((mat - min_val) / prange * 65535).astype("<u2")
    import struct
    buf = _io.BytesIO()
    kaldi.write_token(buf, "CM2")
    buf.write(struct.pack("<ffii", min_val, prange, 20, 30))
    buf.write(q.tobytes())
    buf.seek(0)
    got = kaldi.read_value(buf)
    np.testing.assert_allclose(got, mat, atol=prange / 65535 + 1e-6)


def test_exraw_roundtrip(tmp_path, rng):
    arrs = {
        "a": rng.standard_normal((10, 4)).astype(np.float32),
        "b": rng.integers(0, 100, size=17).astype(np.int64),
        "c": rng.standard_normal(5).astype(np.float64),
    }
    obj, scp = str(tmp_path / "x.bin"), str(tmp_path / "x.scp")
    with ExrawWriter(obj, scp) as w:
        for k, v in arrs.items():
            w.write(k, v)
    got = dict(ExrawReader(obj))
    for k in arrs:
        np.testing.assert_array_equal(got[k], arrs[k])
    sreader = ExrawScriptReader(scp)
    for k in ("c", "a", "b"):
        np.testing.assert_array_equal(sreader[k], arrs[k])


def test_wav_io_and_reader(tmp_path, rng):
    mono = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    multi = (rng.standard_normal((4, 8000)) * 0.1).astype(np.float32)
    write_wav(tmp_path / "mono.wav", mono)
    for c in range(4):
        write_wav(tmp_path / f"multi.CH{c}.wav", multi[c])
    scp = tmp_path / "wav.scp"
    scp.write_text(f"mono {tmp_path}/mono.wav\n"
                   f"multi {tmp_path}/multi.CH*.wav\n")
    reader = WaveReader(str(scp))
    got_mono = reader["mono"]
    assert got_mono.ndim == 1
    np.testing.assert_allclose(got_mono, mono, atol=1e-4)
    got_multi = reader["multi"]
    assert got_multi.shape == (4, 8000)
    np.testing.assert_allclose(got_multi, multi, atol=1e-4)
    assert abs(reader.duration("mono") - 0.5) < 1e-6


def test_wave_writer_dir(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    scp = str(tmp_path / "o.scp")
    with WaveWriter(str(tmp_path / "dump"), scp) as w:
        w.write("key1", x)
    entries = parse_scps(scp)
    assert "key1" in entries
    np.testing.assert_allclose(read_wav(entries["key1"]), x, atol=1e-4)


def test_spectrogram_reader(tmp_path, rng):
    multi = (rng.standard_normal((3, 6000)) * 0.1).astype(np.float32)
    for c in range(3):
        write_wav(tmp_path / f"utt.CH{c}.wav", multi[c])
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt {tmp_path}/utt.CH*.wav\n")
    cfg = StftConfig()
    reader = SpectrogramReader(str(scp), cfg=cfg, transpose=False)
    spec = reader["utt"]
    assert spec.ndim == 3 and spec.shape[0] == 3
    assert spec.shape[1] == cfg.num_bins  # F x T with transpose=False
    ref = np.asarray(forward_stft(reader.read("utt"), cfg))
    np.testing.assert_allclose(spec, np.swapaxes(ref, -1, -2), atol=1e-5)


def test_pipe_scp(tmp_path):
    scp = tmp_path / "t.scp"
    scp.write_text("k1 v1\nk2 v2\n")
    d = parse_scps(f"cat {scp} |")
    assert d == {"k1": "v1", "k2": "v2"}


def test_kaldi_sparse_read(rng):
    """SM/SV sparse records (reference kaldi_io.py:182-243) densify."""
    import struct

    def write_sv(buf, dim, pairs):
        kaldi.write_token(buf, "SV")
        kaldi.write_int32(buf, dim)
        kaldi.write_int32(buf, len(pairs))
        for i, v in pairs:
            buf.write(b"\04" + struct.pack("<i", i))
            buf.write(b"\04" + struct.pack("<f", v))

    rows = [[(1, 0.5), (4, -2.0)], [], [(0, 3.25)]]
    buf = _io.BytesIO()
    kaldi.write_token(buf, "SM")
    kaldi.write_int32(buf, len(rows))
    for pairs in rows:
        write_sv(buf, 6, pairs)
    buf.seek(0)
    mat = kaldi.read_value(buf)
    expect = np.zeros((3, 6), np.float32)
    expect[0, 1], expect[0, 4], expect[2, 0] = 0.5, -2.0, 3.25
    np.testing.assert_array_equal(mat, expect)
    # bare sparse vector record
    buf = _io.BytesIO()
    write_sv(buf, 5, [(2, 1.5)])
    buf.seek(0)
    vec = kaldi.read_value(buf)
    np.testing.assert_array_equal(vec,
                                  np.array([0, 0, 1.5, 0, 0], np.float32))
