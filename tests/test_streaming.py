"""Streaming session (JS/wasm-wrapper analogue): arbitrary chunk
boundaries must not affect decode output — the session delimits Annex-B
NAL units itself (the reference wrapper instead halts when a chunk
boundary lands inside a slice, h264bsd_worker.js:70)."""

import random

import numpy as np
import pytest

from h264bsd_tpu.models.stream import StreamingDecoder, NO_INPUT
from h264bsd_tpu.utils.golden import golden_frames, stream_path


def _run(chunks):
    pics = []
    headers = []
    sd = StreamingDecoder(on_picture_ready=pics.append,
                          on_headers_ready=headers.append)
    for c in chunks:
        sd.queue_input(c)
        sd.pump()
    sd.end_of_stream()
    sd.pump()
    return pics, headers


@pytest.mark.parametrize("chunking", ["whole", "4096", "997", "random"])
def test_chunked_streaming_bit_exact(chunking):
    data = stream_path("640x360").read_bytes()
    goldens = golden_frames("640x360")
    if chunking == "whole":
        chunks = [data]
    elif chunking == "random":
        random.seed(11)
        cuts = sorted(random.sample(range(1, len(data)), 200))
        chunks = [data[a:b] for a, b in zip([0] + cuts, cuts + [len(data)])]
    else:
        n = int(chunking)
        chunks = [data[i:i + n] for i in range(0, len(data), n)]

    pics, headers = _run(chunks)
    assert len(pics) == len(goldens)
    assert headers and headers[0]["width"] == 640
    y, cb, cr = pics[-1].yuv_planes()
    got = (np.asarray(y).tobytes() + np.asarray(cb).tobytes() +
           np.asarray(cr).tobytes())
    assert got[:len(goldens[-1])] == goldens[-1]


def test_no_input_without_complete_nal():
    data = stream_path("640x360").read_bytes()
    sd = StreamingDecoder()
    sd.queue_input(data[:20])      # SPS is longer than this
    assert sd.decode() == NO_INPUT  # incomplete NAL stays buffered
    sd.queue_input(data[20:])
    assert sd.pump() > 0
