"""Encoder decode paths (i8/i16/i32/f32, endianness) and the C++ native
ingest library (when built)."""
import numpy as np
import pytest

from rustpotter_tpu import AudioFmt, Endianness, SampleFormat
from rustpotter_tpu.audio.encoder import AudioEncoder, decode_bytes


def test_decode_i16_le_be():
    vals = np.array([0, 1, -1, 32767, -32768], np.int16)
    le = decode_bytes(vals.astype("<i2").tobytes(), SampleFormat.I16, Endianness.LITTLE)
    be = decode_bytes(vals.astype(">i2").tobytes(), SampleFormat.I16, Endianness.BIG)
    expect = vals.astype(np.float32) / 32767.0
    np.testing.assert_array_equal(le, expect)
    np.testing.assert_array_equal(be, expect)


def test_decode_i8_i32_f32():
    i8 = np.array([0, 127, -128], np.int8)
    np.testing.assert_array_equal(
        decode_bytes(i8.tobytes(), SampleFormat.I8, Endianness.LITTLE),
        i8.astype(np.float32) / 127.0,
    )
    i32 = np.array([0, 2147483647, -2147483648], np.int32)
    np.testing.assert_array_equal(
        decode_bytes(i32.astype("<i4").tobytes(), SampleFormat.I32, Endianness.LITTLE),
        i32.astype(np.float32) / 2147483647.0,
    )
    f32 = np.array([0.5, -0.25], np.float32)
    np.testing.assert_array_equal(
        decode_bytes(f32.astype("<f4").tobytes(), SampleFormat.F32, Endianness.LITTLE),
        f32,
    )


def test_multichannel_downmix():
    fmt = AudioFmt(sample_rate=16000, sample_format=SampleFormat.F32, channels=2)
    enc = AudioEncoder(fmt)
    assert enc.get_input_frame_length() == 960  # 480 frames x 2 channels
    stereo = np.arange(960, dtype=np.float32)
    mono = enc.rencode_and_resample(stereo)
    np.testing.assert_array_equal(mono, stereo[::2])  # first channel


def test_encoder_sizes_16k_and_48k():
    enc16 = AudioEncoder(AudioFmt(sample_rate=16000))
    assert enc16.get_input_frame_length() == 480
    assert enc16.get_output_frame_length() == 480
    enc48 = AudioEncoder(AudioFmt(sample_rate=48000))
    assert enc48.get_input_frame_length() == 1440
    assert enc48.get_output_frame_length() == 480


def test_native_library(resources):
    nat = pytest.importorskip("rustpotter_tpu.native")
    if not nat.available():
        pytest.skip("native library not built (make -C native)")
    import os

    from rustpotter_tpu.audio.resampler import FftResampler
    from rustpotter_tpu.utils.wav import read_wav

    raw = open(os.path.join(resources, "oye_casa_g_1.wav"), "rb").read()
    info = nat.wav_parse(raw)
    assert info.sample_rate == 16000 and info.channels == 1
    body = raw[info.data_offset : info.data_offset + info.data_bytes]
    s_native = nat.decode_pcm(body, "i16")
    s_py, _ = read_wav(raw)
    np.testing.assert_array_equal(s_native, s_py.astype(np.float32) / 32767.0)

    src, _ = read_wav(os.path.join(resources, "real_sample.wav"))
    nr = nat.NativeResampler(1440, 480)
    fr = FftResampler(1440, 480)
    for c in range(40):
        chunk = src[c * 1440 : (c + 1) * 1440]
        np.testing.assert_allclose(nr.process(chunk), fr.process(chunk), atol=1e-6)
    assert abs(nat.rms_level(np.ones(480, np.float32)) - 1.0) < 1e-6
