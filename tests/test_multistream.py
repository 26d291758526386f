"""Batched multi-stream decoding (BASELINE config 5 analogue): N concurrent
streams through one vmapped device step must stay bit-exact per stream."""

import numpy as np
import pytest

from h264bsd_tpu.parallel.multistream import MultiStreamDecoder
from h264bsd_tpu.utils.golden import golden_frames, stream_path

N_STREAMS = 3
N_CHECK = 4  # compare the last picture of the first N_CHECK rounds


def test_multistream_batched_decode():
    data = stream_path("640x360").read_bytes()
    ms = MultiStreamDecoder([data] * N_STREAMS)
    goldens = golden_frames("640x360")

    rounds = 0
    while rounds < N_CHECK and ms.step():
        rounds += 1
        # every stream decoded the same picture; check the most recent
        for s in range(N_STREAMS):
            o = ms.outputs[s][-1]
            y, cb, cr = ms.picture(s, len(ms.outputs[s]) - 1)
            got = (np.asarray(y).tobytes() + np.asarray(cb).tobytes() +
                   np.asarray(cr).tobytes())
            ref = goldens[len(ms.outputs[s]) - 1]
            assert got[:len(ref)] == ref, (s, len(ms.outputs[s]) - 1)
    assert rounds == N_CHECK
    assert all(len(o) == N_CHECK for o in ms.outputs)
