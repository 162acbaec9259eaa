"""Native C++ WAV decoder: builds, matches the Python decoder bit-for-bit on
16/24/32-bit and float WAVs, multichannel averaging, threaded batch."""
import struct
import wave

import numpy as np
import pytest

from pcaudio import native
from pcaudio.data.audio_io import load_wav, load_wav_batch


def _write_wav(path, x, sw=2, ch=1, fs=44100):
    xs = np.repeat(x[:, None], ch, 1).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sw)
        w.setframerate(fs)
        if sw == 2:
            w.writeframes((xs * 32767).astype("<i2").tobytes())
        elif sw == 4:
            w.writeframes((xs * 2147483000).astype("<i4").tobytes())
        elif sw == 3:
            v = (xs * 8388000).astype(np.int32)
            b = np.zeros((len(v), 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            w.writeframes(b.tobytes())
        elif sw == 1:
            w.writeframes(((xs * 127) + 128).astype(np.uint8).tobytes())


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


@pytest.mark.parametrize("sw", [1, 2, 3, 4])
def test_native_matches_python(tmp_path, sw):
    rng = np.random.default_rng(sw)
    x = (0.8 * rng.uniform(-1, 1, 3000)).astype(np.float32)
    p = tmp_path / f"t{sw}.wav"
    _write_wav(p, x, sw=sw)
    ref, _ = load_wav(str(p))
    got, lengths = native.decode_wav_batch([str(p)], 4096)
    assert lengths[0] == 3000
    np.testing.assert_allclose(got[0, :3000], ref, atol=1e-7)
    assert (got[0, 3000:] == 0).all()


def test_native_stereo_average(tmp_path):
    x = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
    p = tmp_path / "st.wav"
    _write_wav(p, x, sw=2, ch=2)
    ref, _ = load_wav(str(p))
    got, lengths = native.decode_wav_batch([str(p)], 2048)
    np.testing.assert_allclose(got[0, :1000], ref, atol=1e-7)


def test_native_batch_threaded(tmp_path):
    paths = []
    refs = []
    rng = np.random.default_rng(0)
    for i in range(12):
        x = (0.5 * rng.uniform(-1, 1, 500 + 100 * i)).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        _write_wav(p, x)
        paths.append(str(p))
        refs.append(load_wav(str(p))[0])
    got, lengths = native.decode_wav_batch(paths, 4096, num_threads=4)
    for i in range(12):
        assert lengths[i] == len(refs[i])
        np.testing.assert_allclose(got[i, : lengths[i]], refs[i], atol=1e-7)
    # load_wav_batch auto-routes through the native path
    auto, al = load_wav_batch(paths, 4096)
    np.testing.assert_array_equal(auto, got)


def test_native_error_on_missing_file(tmp_path):
    with pytest.raises(RuntimeError):
        native.decode_wav_batch([str(tmp_path / "nope.wav")], 1024)


def test_prefetching_loader(tmp_path):
    """C++ prefetch pipeline: slots decode ahead, order preserved, zero-copy
    views match the synchronous decoder, slot recycling works past depth."""
    rng = np.random.default_rng(7)
    groups, refs = [], []
    for g in range(5):
        ps = []
        for i in range(3):
            x = (0.7 * rng.uniform(-1, 1, 400 + 50 * g + 10 * i)
                 ).astype(np.float32)
            p = tmp_path / f"g{g}_{i}.wav"
            _write_wav(p, x)
            ps.append(str(p))
        groups.append(ps)
        refs.append(load_wav_batch(ps, 1024))
    with native.PrefetchingLoader(1024, batch=3, depth=2,
                                  num_threads=3) as pf:
        for g in groups[:2]:
            pf.submit(g)
        for g in range(5):
            waves, lengths, n = pf.next()
            assert n == 3
            rw, rl = refs[g]
            np.testing.assert_array_equal(lengths[:3], rl)
            np.testing.assert_allclose(waves[:3], rw, atol=1e-7)
            if g + 2 < 5:
                pf.submit(groups[g + 2])


def test_prefetching_loader_error(tmp_path):
    with native.PrefetchingLoader(512, batch=2, depth=1) as pf:
        pf.submit([str(tmp_path / "missing_a.wav"),
                   str(tmp_path / "missing_b.wav")])
        with pytest.raises(RuntimeError):
            pf.next()


def test_native_int16_staging(tmp_path):
    """int16 staging: bit-exact PCM16 pass-through (out[i]/32768 == the f32
    decode), buffer reuse via out=, and the prefetcher's int16 slots."""
    rng = np.random.default_rng(11)
    paths, sizes = [], []
    for i in range(4):
        x = (0.8 * rng.uniform(-1, 1, 700 + 100 * i)).astype(np.float32)
        p = tmp_path / f"i{i}.wav"
        _write_wav(p, x)
        paths.append(str(p))
        sizes.append(700 + 100 * i)
    f32, lf = native.decode_wav_batch(paths, 2048)
    i16, li = native.decode_wav_batch(paths, 2048, dtype=np.int16)
    assert i16.dtype == np.int16
    np.testing.assert_array_equal(lf, li)
    np.testing.assert_array_equal(i16.astype(np.float32) / 32768.0, f32)
    # reused output buffer (the slow-first-touch-kernel path)
    buf = np.empty((4, 2048), np.int16)
    buf.fill(-7)  # garbage that must be overwritten incl. tails
    out2, _ = native.decode_wav_batch(paths, 2048, dtype=np.int16, out=buf)
    assert out2 is buf
    np.testing.assert_array_equal(buf, i16)
    # prefetcher int16 slots + explicit acquire/release protocol
    with native.PrefetchingLoader(2048, batch=4, depth=2,
                                  dtype=np.int16) as pf:
        pf.submit(paths)
        pf.submit(paths)
        w1, l1, n1 = pf.acquire()
        w2, l2, n2 = pf.acquire()   # second slot held simultaneously
        assert n1 == n2 == 4 and w1.dtype == np.int16
        np.testing.assert_array_equal(w1, i16)
        np.testing.assert_array_equal(w2, i16)
        pf.release()
        pf.release()
