"""Native wav loader parity vs the Python decoder (bit-exact)."""

import numpy as np
import pytest

from setk_tpu.io.wave import read_wav, write_wav, wav_info
from setk_tpu.utils.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _write_raw(path, samps, bits, fmt_code, sr=16000):
    """Write a wav in an arbitrary supported encoding (test fixture)."""
    import struct
    samps = np.atleast_2d(samps)
    channels, frames = samps.shape
    inter = np.ascontiguousarray(samps.T)
    if fmt_code == 3 and bits == 32:
        data = inter.astype("<f4").tobytes()
    elif fmt_code == 3 and bits == 64:
        data = inter.astype("<f8").tobytes()
    elif bits == 16:
        data = np.clip(np.round(inter * 32768), -32768,
                       32767).astype("<i2").tobytes()
    elif bits == 32:
        data = np.clip(np.round(inter.astype(np.float64) * 2147483648),
                       -2**31, 2**31 - 1).astype("<i4").tobytes()
    elif bits == 24:
        v = np.clip(np.round(inter * (1 << 23)), -(1 << 23),
                    (1 << 23) - 1).astype("<i4")
        u = (v & 0xFFFFFF).astype("<u4").reshape(-1)
        b = np.zeros((u.size, 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        data = b.tobytes()
    elif bits == 8:
        data = (np.clip(np.round(inter * 128), -128, 127) +
                128).astype(np.uint8).tobytes()
    else:
        raise ValueError
    block = channels * (bits // 8)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1 if fmt_code != 3 else 3,
                                 channels, sr, sr * block, block, bits)
    hdr += b"data" + struct.pack("<I", len(data))
    with open(path, "wb") as fd:
        fd.write(hdr + data)


@pytest.mark.parametrize("bits,fmt_code",
                         [(16, 1), (24, 1), (32, 1), (8, 1), (32, 3),
                          (64, 3)])
@pytest.mark.parametrize("channels", [1, 4])
def test_decode_parity(tmp_path, rng, bits, fmt_code, channels):
    from setk_tpu.io.native_wav import read_wav_native
    x = (rng.standard_normal((channels, 2048)) * 0.3).astype(np.float32)
    path = tmp_path / "t.wav"
    _write_raw(path, x, bits, fmt_code)
    for normalize in (True, False):
        ref = read_wav(path, normalize=normalize)
        got = read_wav_native(path, normalize=normalize)
        assert ref.shape == got.shape
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_chunk_and_info_parity(tmp_path, rng):
    from setk_tpu.io.native_wav import read_wav_native, wav_info_native
    x = (rng.standard_normal((2, 5000)) * 0.3).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, x)
    assert wav_info(path) == wav_info_native(path)
    ref = read_wav(path, beg=123, end=4321)
    got = read_wav_native(path, beg=123, end=4321)
    np.testing.assert_array_equal(ref, got)
    # end beyond EOF clamps
    np.testing.assert_array_equal(read_wav(path, beg=4000, end=99999),
                                  read_wav_native(path, beg=4000, end=99999))


def test_write_parity(tmp_path, rng):
    from setk_tpu.io.native_wav import write_wav_native
    for shape in ((3000,), (2, 3000)):
        x = (rng.standard_normal(shape) * 0.5).astype(np.float32)
        p1, p2 = tmp_path / "py.wav", tmp_path / "nat.wav"
        write_wav(p1, x)
        write_wav_native(p2, x)
        assert p1.read_bytes() == p2.read_bytes()


def test_batch_read_padding_and_guard(tmp_path, rng):
    from setk_tpu.io.native_wav import batch_read_into
    lens = [1500, 3000]
    paths = []
    refs = []
    for i, n in enumerate(lens):
        x = (rng.standard_normal((3, n)) * 0.3).astype(np.float32)
        p = tmp_path / f"{i}.wav"
        write_wav(p, x)
        refs.append(read_wav(p))
        paths.append(p)
    bucket = 4000
    out = np.zeros((2, 3, bucket), dtype=np.float32)
    ch, fr = batch_read_into(paths, out, [0, out[0].size],
                             chan_stride=bucket, max_channels=3)
    assert list(ch) == [3, 3] and list(fr) == lens
    for i, n in enumerate(lens):
        np.testing.assert_array_equal(out[i, :, :n], refs[i])
        assert not out[i, :, n:].any()
    with pytest.raises(RuntimeError):
        batch_read_into(paths, out, [0, out[0].size], chan_stride=bucket,
                        max_channels=2)


def test_wave_reader_native_path(tmp_path, rng):
    from setk_tpu.io import WaveReader
    x = (rng.standard_normal((4, 2500)) * 0.3).astype(np.float32)
    for c in range(4):
        write_wav(tmp_path / f"utt.CH{c}.wav", x[c])
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt {tmp_path}/utt.CH*.wav\n")
    nat = WaveReader(str(scp), native=True)["utt"]
    py = WaveReader(str(scp), native=False)["utt"]
    np.testing.assert_array_equal(nat, py)


def test_prefetch_loader_matches_reader(tmp_path, rng):
    from setk_tpu.io.prefetch import PrefetchWaveLoader
    from setk_tpu.io import WaveReader
    lines = []
    for i in range(7):
        n = 1000 + 317 * i
        x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
        write_wav(tmp_path / f"u{i}.wav", x)
        lines.append(f"u{i} {tmp_path}/u{i}.wav")
    # one multi-channel glob entry and one mono entry
    write_wav(tmp_path / "g.CH0.wav",
              (rng.standard_normal(1200) * 0.3).astype(np.float32))
    write_wav(tmp_path / "g.CH1.wav",
              (rng.standard_normal(1200) * 0.3).astype(np.float32))
    lines.append(f"g {tmp_path}/g.CH*.wav")
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(lines) + "\n")
    ref = dict(iter(WaveReader(str(scp), native=False)))
    loader = PrefetchWaveLoader(str(scp), window=3)
    got = dict(iter(loader))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k])
