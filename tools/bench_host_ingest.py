"""Host ingest throughput: PCM bytes → f32 frames, per core.

Demonstrates the host front-end can feed the measured on-chip stream count
(VERDICT r1 missing #4). Serving shapes:
  - 16 kHz i16 ingest (the production path): decode only — no resampling
  - 48 kHz f32 ingest: decode + either host resample (python FFT-OLA or C++
    polyphase) or decode-only with the resampler IN-GRAPH on the TPU
    (stream_step in_graph_resample=True, the recommended 48 kHz serving mode)

Prints one JSON line per shape: realtime 16 kHz-equivalent streams per core.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rustpotter_tpu import native
from rustpotter_tpu.audio.encoder import decode_bytes
from rustpotter_tpu.audio.resampler import FftResampler
from rustpotter_tpu.config import Endianness, SampleFormat


def _report(name, audio_seconds, elapsed):
    streams = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": f"host_ingest_realtime_streams_per_core[{name}]",
                "value": round(streams, 1),
                "unit": "streams (audio-sec/s)",
            }
        ),
        flush=True,
    )
    return streams


def main():
    rng = np.random.default_rng(0)
    seconds = float(os.environ.get("INGEST_SECONDS", "120"))

    # ---- 16 kHz i16 decode (python/numpy)
    n = int(seconds * 16000)
    pcm16 = (rng.normal(0, 0.1, n).clip(-1, 1) * 32767).astype("<i2").tobytes()
    t0 = time.perf_counter()
    out = decode_bytes(pcm16, SampleFormat.I16, Endianness.LITTLE)
    _report("decode_i16_16k_numpy", seconds, time.perf_counter() - t0)
    assert out.dtype == np.float32

    # ---- 16 kHz i16 decode (C++)
    if native.available():
        t0 = time.perf_counter()
        out = native.decode_pcm(pcm16, "i16")
        _report("decode_i16_16k_native", seconds, time.perf_counter() - t0)

    # ---- 48 kHz f32: decode + host FFT-OLA resample (python, per-chunk)
    n48 = int(seconds * 48000) // 1440 * 1440
    f32 = rng.normal(0, 0.1, n48).astype(np.float32)
    raw48 = f32.tobytes()
    rs = FftResampler(1440, 480)
    t0 = time.perf_counter()
    s = decode_bytes(raw48, SampleFormat.F32, Endianness.LITTLE)
    for c in range(len(s) // 1440):
        rs.process(s[c * 1440 : (c + 1) * 1440])
    _report("decode_f32_48k_resample_python", n48 / 48000, time.perf_counter() - t0)

    # ---- 48 kHz f32: decode + C++ polyphase resample
    if native.available():
        nr = native.NativeResampler(1440, 480)
        t0 = time.perf_counter()
        s = native.decode_pcm(raw48, "f32")
        for c in range(len(s) // 1440):
            nr.process(s[c * 1440 : (c + 1) * 1440])
        _report("decode_f32_48k_resample_native", n48 / 48000, time.perf_counter() - t0)

    # ---- 48 kHz f32: decode only (resampler runs in-graph on the TPU)
    t0 = time.perf_counter()
    decode_bytes(raw48, SampleFormat.F32, Endianness.LITTLE)
    _report("decode_f32_48k_ingraph_resample", n48 / 48000, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
