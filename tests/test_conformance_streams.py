"""Crafted-stream conformance: features the bundled clips never exercise
end-to-end (FMO dispersed maps, POC types 0/1, multi-slice pictures,
all-skip P pictures, zero-reorder VUI), byte-compared against the
reference decoder binary on streams built by utils/streamgen."""

import pathlib
import subprocess

import numpy as np
import pytest

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils import golden
from h264bsd_tpu.utils.streamgen import (make_conformance_stream,
                                         make_deblock_control_stream,
                                         make_intra_in_p_stream,
                                         make_intra_stress_stream,
                                         make_multiref_stream,
                                         make_pcm_stream,
                                         make_qp_sweep_stream,
                                         make_redundant_stream)

CASES = {
    "multi_frame": dict(n_frames=4),
    "poc_type0": dict(n_frames=4, poc_type=0),
    "poc_type1": dict(n_frames=4, poc_type=1),
    "fmo_dispersed2": dict(n_frames=4, num_slice_groups=2),
    "fmo_dispersed3": dict(n_frames=4, num_slice_groups=3,
                           width_mbs=6, height_mbs=3),
    "fmo_poc0": dict(n_frames=3, poc_type=0, num_slice_groups=2),
    "four_slices": dict(n_frames=3, slices_per_frame=4),
    "larger_pic": dict(width_mbs=8, height_mbs=6, n_frames=5),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_crafted_stream_bit_exact(name, tmp_path):
    kw = CASES[name]
    data = make_conformance_stream(**kw)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    frame_size = (kw.get("width_mbs", 4) * kw.get("height_mbs", 4) *
                  256 * 3 // 2)
    assert len(ref) == kw["n_frames"] * frame_size

    pics = list(decode_stream(data))
    assert len(pics) == kw["n_frames"]
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


# Multi-reference / MMCO scenarios (reference dpb.c): each P frame carries
# a distinct DC residual, so a wrong reference pick, list order or marking
# decision changes the output bytes. Frame dicts per make_multiref_stream.
MULTIREF_CASES = {
    # multi-entry list init + explicit ref_idx alternation (InitRefPicList)
    "two_ref_alternate": dict(num_ref_frames=2, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, n_active=2, ref_idx=1, dc=-3),
        dict(frame_num=3, n_active=2, ref_idx=0, dc=6),
        dict(frame_num=4, n_active=2, ref_idx=1, dc=-4),
    ]),
    # reordering_of_pic_nums_idc 0 (abs_diff subtract, ReorderRefPicList)
    "reorder_oldest": dict(num_ref_frames=4, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, dc=-3),
        dict(frame_num=3, dc=6),
        dict(frame_num=4, reorder=[(0, 3)], dc=-5),   # picNum 0 (the IDR)
        dict(frame_num=5, reorder=[(0, 1)], dc=7),    # picNum 3
    ]),
    # MMCO 4 (set max long-term idx) + MMCO 3 (short->long conversion),
    # then referencing the long-term entry by position and by reorder
    # command idc 2 (long_term_pic_num)
    "longterm": dict(num_ref_frames=3, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, mmco=[(4, 1), (3, 0, 0)], dc=5),
        dict(frame_num=2, dc=-3),
        dict(frame_num=3, n_active=3, ref_idx=2, dc=6),
        dict(frame_num=4, reorder=[(2, 0)], dc=-6),
    ]),
    # MMCO 1: unmark a short-term reference mid-stream
    "mmco_unmark": dict(num_ref_frames=2, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, mmco=[(1, 0)], dc=-3),      # unmark frame 1
        dict(frame_num=3, n_active=2, ref_idx=1, dc=7),  # -> the IDR
    ]),
    # MMCO 5: reset all references; frame_num restarts after it
    "mmco5_reset": dict(num_ref_frames=2, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, mmco=[(5,)], dc=-3),
        dict(frame_num=1, dc=6),                      # post-reset numbering
        dict(frame_num=2, dc=-5),
    ]),
    # IDR long_term_reference_flag: the IDR itself becomes long-term
    "idr_longterm": dict(num_ref_frames=2, frames=[
        dict(idr=True, frame_num=0, lt_flag=True, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, n_active=2, ref_idx=1, dc=-4),  # the LT IDR
    ]),
    # one P frame referencing SIX distinct DPB slots (MB i -> list entry
    # i%6): crosses the Pallas MC VMEM group size, exercising the merged
    # multi-group kernel path (ops.pallas_mc REF_GROUP)
    "six_ref_cycle": dict(num_ref_frames=6, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=2, dc=-3),
        dict(frame_num=3, dc=6),
        dict(frame_num=4, dc=-4),
        dict(frame_num=5, dc=7),
        dict(frame_num=6, n_active=6, ref_cycle=6, dc=-5),
    ]),
    # gaps_in_frame_num: frame 2 never arrives and is synthesized as a
    # non-existing reference (h264bsdCheckGapsInFrameNum dpb.c:1218);
    # every P picks an index pointing at a real frame (referencing a
    # non-existing frame reads undefined memory in the reference)
    "frame_num_gap": dict(gaps_allowed=True, num_ref_frames=2, frames=[
        dict(idr=True, frame_num=0, dc=4),
        dict(frame_num=1, dc=5),
        dict(frame_num=3, n_active=2, ref_idx=1, dc=-3),  # list [gap, fn1]
        dict(frame_num=4, n_active=2, ref_idx=0, dc=6),   # list [fn3, gap]
    ]),
}


@pytest.mark.parametrize("name", sorted(MULTIREF_CASES))
def test_multiref_mmco_bit_exact(name, tmp_path):
    kw = MULTIREF_CASES[name]
    data = make_multiref_stream(**kw)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    frame_size = 4 * 4 * 256 * 3 // 2
    assert len(ref) == len(kw["frames"]) * frame_size

    pics = list(decode_stream(data))
    assert len(pics) == len(kw["frames"])
    assert all(p.num_err_mbs == 0 for p in pics)
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


@pytest.mark.parametrize("lost", [False, True],
                         ids=["primary_kept", "primary_lost"])
def test_redundant_slices_bit_exact(lost, tmp_path):
    """Redundant coded slices (decoded-counter semantics,
    macroblock_layer.c:988,:1006-1011): ignored when the primary decoded,
    used to fill in MBs whose primary slice was lost."""
    data = make_redundant_stream(lost=lost)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    assert len(ref) == 2 * (4 * 4 * 256 * 3 // 2)

    pics = list(decode_stream(data))
    assert len(pics) == 2
    assert all(p.num_err_mbs == 0 for p in pics)
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


def test_ipcm_bit_exact(tmp_path):
    """I_PCM macroblocks (raw-sample passthrough, reference
    macroblock_layer.c:171-190) on a checkerboard with DC-predicted
    neighbours, plus a P frame sampling the mixed picture — covers PCM
    neighbour pels in intra prediction, PCM boundaries in deblocking
    (intra bS, qpY 0), and EPB sequences inside PCM payloads."""
    data = make_pcm_stream()
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    assert len(ref) == 2 * (4 * 2 * 256 * 3 // 2)

    pics = list(decode_stream(data))
    assert len(pics) == 2
    assert all(p.num_err_mbs == 0 for p in pics)
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


FEATURE_STREAMS = {
    # per-MB mb_qp_delta sweep incl. mod-52 wraparound; QP-varying
    # deblock thresholds
    "qp_sweep": (make_qp_sweep_stream, (), 2, (4, 4)),
    # slice-level deblock control: idc 0/1/2 slices with alpha/beta
    # offsets, P frame with its own controls
    "deblock_control": (make_deblock_control_stream, (), 2, (4, 6)),
    # intra MBs inside P slices
    "intra_in_p": (make_intra_in_p_stream, (False,), 3, (4, 4)),
    # same with PPS constrained_intra_pred (inter neighbours unavailable)
    "intra_in_p_constrained": (make_intra_in_p_stream, (True,), 3, (4, 4)),
}


@pytest.mark.parametrize("name", sorted(FEATURE_STREAMS))
def test_feature_stream_bit_exact(name, tmp_path):
    maker, args, n_frames, (w_mbs, h_mbs) = FEATURE_STREAMS[name]
    data = maker(*args)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    assert len(ref) == n_frames * (w_mbs * h_mbs * 256 * 3 // 2)

    pics = list(decode_stream(data))
    assert len(pics) == n_frames
    assert all(p.num_err_mbs == 0 for p in pics)
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


def test_flush_buffer_drains_pending_pictures():
    """h264bsdFlushBuffer equivalent: a reordered (POC type 0) stream
    without the zero-reorder VUI holds every picture in the DPB; flush
    must drain them in display order with the same content the
    immediate-output variant produces."""
    from h264bsd_tpu.models.decoder import Decoder, PIC_RDY
    import h264bsd_tpu.utils.streamgen as sg

    data_vui = make_conformance_stream(n_frames=4, poc_type=0)
    nals = data_vui.split(b"\x00\x00\x00\x01")[1:]
    slices = [n for n in nals if n[0] & 0x1F in (1, 5)]
    data_novui = (sg._sps(4, 4, 0) + sg._pps(26) +
                  b"".join(b"\x00\x00\x00\x01" + s for s in slices))

    dec = Decoder()
    pos, outs = 0, []
    while pos < len(data_novui):
        s, r = dec.decode(data_novui[pos:], pic_id=len(outs))
        pos += r
        while (p := dec.next_output_picture()) is not None:
            outs.append(p)
    assert outs == []          # everything pending
    dec.flush_buffer()
    while (p := dec.next_output_picture()) is not None:
        outs.append(p)
    assert len(outs) == 4
    assert dec.matrix_coefficients() == 2  # no colour description in VUI

    ref = list(decode_stream(data_vui))
    for a, b in zip(outs, ref):
        for pa, pb in zip(a.yuv_planes(), b.yuv_planes()):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.parametrize("kw", [
    dict(width_mbs=16, height_mbs=9, n_frames=3),
    dict(width_mbs=6, height_mbs=4, n_frames=2, qp=12),
    dict(width_mbs=4, height_mbs=4, n_frames=2, qp=0),   # dequant floor
    # 48 is the highest QP where the stress levels (up to 10) keep the
    # IDCT inside [-512,511]; at 51 the reference itself rejects the slice
    dict(width_mbs=4, height_mbs=4, n_frames=2, qp=48),
])
def test_intra_stress_bit_exact(kw, tmp_path):
    """All-I stream with explicit varied intra modes + residual in every
    luma block (BASELINE config 3 analogue, small geometry)."""
    data = make_intra_stress_stream(**kw)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    pics = list(decode_stream(data))
    assert len(pics) == kw["n_frames"]
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref


def test_six_ref_frame_takes_kernel_path(monkeypatch):
    """A frame referencing more than MC_REF_CAP slots must still pick the
    Pallas MC path (merged multi-group passes) instead of falling back to
    the XLA gather cliff — probe the host-side _prepare decision with the
    kernel mode forced on (the kernels themselves are TPU-only; their
    multi-group parity is pinned by test_pallas_mc)."""
    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.models import decoder as D

    data = make_multiref_stream(**MULTIREF_CASES["six_ref_cycle"])
    monkeypatch.setattr(D, "_MC_MODE", "pallas")
    dec = D.Decoder()
    preps = []
    orig = dec._submit
    monkeypatch.setattr(dec, "_submit",
                        lambda prep: preps.append(prep) or None)
    pos = 0
    while pos < len(data):
        status, read = dec.decode(data[pos:], 0)
        pos += read
        if status >= fe.ERROR and read == 0:
            break
    last = preps[-1]           # the 6-reference P frame
    assert last["info"]["used_slot_count"] == 6
    assert last["mc_pallas"]
    assert last["used_slots"].shape == (8,)   # 4/8/16 tier ladder
    assert sorted(set(last["used_slots"].tolist())) == sorted(
        set(last["used_slots"][:6].tolist()))
    dec.close()
