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
