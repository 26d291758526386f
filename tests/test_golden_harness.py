"""The golden oracle itself must be sound before anything is built against it."""

from h264bsd_tpu.utils.golden import STREAMS, golden_frames


def test_golden_frames_shapes():
    frames = golden_frames("640x360")
    assert len(frames) == 73
    assert all(len(f) == 640 * 360 * 3 // 2 for f in frames)


def test_golden_1080p():
    frames = golden_frames("1920x1080")
    assert len(frames) == 73
    assert all(len(f) == 1920 * 1080 * 3 // 2 for f in frames)
