"""Batched multi-stream decoding (BASELINE config 5 analogue): N concurrent
streams through one batched device step must stay bit-exact per stream —
on one device, sharded over a stream mesh axis, and with a corrupted
stream that needs the exact spiral concealment."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from h264bsd_tpu.models.decoder import decode_stream
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


def _corrupt(data: bytes, at: float) -> bytes:
    """Flip bits mid-slice-payload without forging a start code."""
    buf = bytearray(data)
    pos = int(len(buf) * at)
    buf[pos] ^= 0x5A
    buf[pos + 1] ^= 0xC3
    return bytes(buf)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_multistream_sharded_decode(n_dev):
    """Streams sharded over a mesh axis with REAL per-stream data,
    including a corrupted stream that takes the exact concealment path.
    Every stream's pictures must match its own single-stream decode."""
    clean = stream_path("640x360").read_bytes()
    corrupt_p = _corrupt(clean, 0.55)       # P-slice loss (batched path)
    corrupt_i = _corrupt(clean, 0.007)      # IDR partial loss (exact path)
    streams = ([clean, corrupt_p, corrupt_i, clean] * 2)[:max(n_dev, 4)]
    while len(streams) % n_dev:
        streams.append(clean)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("stream",))
    ms = MultiStreamDecoder(streams, mesh=mesh)
    rounds = 0
    while rounds < N_CHECK and ms.step():
        rounds += 1
    assert rounds == N_CHECK

    # reference: per-stream single decode
    for s, data in enumerate(streams):
        n_out = len(ms.outputs[s])
        if n_out == 0:
            continue
        singles = []
        for pic in decode_stream(data, max_pictures=n_out):
            singles.append(b"".join(np.asarray(p).tobytes()
                                    for p in pic.yuv_planes()))
        got = b"".join(np.asarray(p).tobytes()
                       for p in ms.picture(s, n_out - 1))
        assert got == singles[n_out - 1], f"stream {s}"


def test_multistream_divisibility_check():
    mesh = Mesh(np.array(jax.devices()[:2]), ("stream",))
    with pytest.raises(ValueError):
        MultiStreamDecoder([b""] * 3, mesh=mesh)
