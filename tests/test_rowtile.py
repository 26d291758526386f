"""Luma rowtile path == baseline frame step, byte-identical.

The rowtile layout keeps luma in plane-chunk (nG, 16, 128) tiles from
the Pallas MC kernel through residual add and combine, reaching the
plane with one major-dim reshape instead of three minor-dim u8
relayouts (ops.transform.residual_planes_sparse /
ops.pallas_mc.mc_predict_grids / ops.reconstruct.reconstruct_frame_fast
under luma_rowtile=True). Every frame of a kernels-on decode with the
flag must equal the plain XLA decode byte-for-byte (interpret mode on
CPU; the TPU bench re-verifies bit-exactness on hardware).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from h264bsd_tpu.ops.reconstruct import build_pcm_tensors
from h264bsd_tpu.utils.streamgen import make_pcm_stream
from tests.test_rowshard import STREAMS, _blob_preps


@pytest.mark.parametrize("name", ["conformance_8x8", "intra_stress",
                                  "multi_slice"])
def test_rowtile_bit_exact(name):
    from h264bsd_tpu.models.decoder import _decode_step

    data = STREAMS[name]()
    base = kern = rt = None
    n = 0
    for prep, info in _blob_preps(data):
        w_mbs, h_mbs = prep["w_mbs"], prep["h_mbs"]
        assert w_mbs % 8 == 0
        n_mbs = prep["n_mbs"]
        h, w = h_mbs * 16, w_mbs * 16
        if base is None:
            ns = info["dpb_slots"]
            base = (jnp.zeros((ns, h, w), jnp.uint8),
                    jnp.zeros((ns, h // 2, w // 2), jnp.uint8),
                    jnp.zeros((ns, h // 2, w // 2), jnp.uint8))
            kern = rt = base
        pcm = (jnp.zeros((n_mbs, 16, 16), jnp.uint8),
               jnp.zeros((n_mbs, 8, 8), jnp.uint8),
               jnp.zeros((n_mbs, 8, 8), jnp.uint8))
        pcm_rt = (jnp.zeros((n_mbs // 8, 16, 128), jnp.uint8),
                  jnp.zeros((n_mbs // 8, 8, 64), jnp.uint8),
                  jnp.zeros((n_mbs // 8, 8, 64), jnp.uint8))
        blob = jnp.asarray(prep["blob"])
        pi = prep["info"]
        args = (jnp.int32(pi["slot"]), jnp.bool_(pi["conceal_from_ref"]),
                jnp.int32(pi["conceal_ref_slot"]), w_mbs, h_mbs,
                prep["caps"], prep["wavefront"],
                jnp.asarray(prep["used_slots"]))
        base = _decode_step(blob, *base, *pcm, *args, False, False)
        kern = _decode_step(blob, *kern, *pcm, *args, True, True,
                            False, True)
        # the wavefront intra tier keeps the grid layout (the rowtile
        # gate excludes it); only list-intra frames take the flag
        if prep["wavefront"]:
            rt = _decode_step(blob, *rt, *pcm, *args, True, True,
                              False, True)
        else:
            rt = _decode_step(blob, *rt, *pcm_rt, *args, True, True,
                              True, True)
        for which, got in (("kernels", kern), ("rowtile", rt)):
            for p in range(3):
                a = np.asarray(base[p][pi["slot"]])
                b = np.asarray(got[p][pi["slot"]])
                assert (a == b).all(), (
                    f"{name} frame {n} {which} plane {p}: "
                    f"{int((a != b).sum())} byte diffs")
        n += 1
    assert n > 0


def test_rowtile_pcm_content():
    """I_PCM raw samples must reach the rowtile combine through the
    host-side plane-chunk relayout (Decoder._submit builds it with
    numpy) byte-identically to the grid merge."""
    from h264bsd_tpu.models.decoder import _decode_step

    data = make_pcm_stream(width_mbs=8, height_mbs=2)
    base = rt = None
    n = 0
    for prep, info in _blob_preps(data):
        w_mbs, h_mbs = prep["w_mbs"], prep["h_mbs"]
        n_mbs = prep["n_mbs"]
        h, w = h_mbs * 16, w_mbs * 16
        if base is None:
            ns = info["dpb_slots"]
            base = (jnp.zeros((ns, h, w), jnp.uint8),
                    jnp.zeros((ns, h // 2, w // 2), jnp.uint8),
                    jnp.zeros((ns, h // 2, w // 2), jnp.uint8))
            rt = base
        mb, blobs = prep["ipcm"]
        n += len(mb)
        py, pcb, pcr = build_pcm_tensors(n_mbs, mb, blobs)
        g = n_mbs // 8
        py_rt = py.reshape(g, 8, 16, 16) \
            .transpose(0, 2, 1, 3).reshape(g, 16, 128)
        pcb_rt = pcb.reshape(g, 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(g, 8, 64)
        pcr_rt = pcr.reshape(g, 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(g, 8, 64)
        blob = jnp.asarray(prep["blob"])
        pi = prep["info"]
        args = (jnp.int32(pi["slot"]), jnp.bool_(pi["conceal_from_ref"]),
                jnp.int32(pi["conceal_ref_slot"]), w_mbs, h_mbs,
                prep["caps"], prep["wavefront"],
                jnp.asarray(prep["used_slots"]))
        j = jnp.asarray
        base = _decode_step(blob, *base, j(py), j(pcb), j(pcr), *args,
                            False, False)
        rt = _decode_step(blob, *rt, j(py_rt), j(pcb_rt), j(pcr_rt),
                          *args, True, True, True, True)
        for p in range(3):
            a = np.asarray(base[p][pi["slot"]])
            b = np.asarray(rt[p][pi["slot"]])
            assert (a == b).all(), (
                f"plane {p}: {int((a != b).sum())} byte diffs")
    assert n > 0, "PCM stream must carry I_PCM macroblocks"


def test_rowtile_residual_parity_random():
    """Rowtile residual tiles == the dense residual path, on RANDOM
    sparse blocks covering every block class (luma AC, both chroma
    planes, DC rows) across many groups. The e2e rowtile streams carry
    few multi-group chroma AC blocks, which let a chroma placement bug
    (group stride 4 bands instead of 2) reach hardware in round 5 —
    this pins the layouts directly."""
    from h264bsd_tpu.ops.reconstruct import mb_grid_to_plane
    from h264bsd_tpu.ops.transform import residual_planes_sparse

    rng = np.random.default_rng(7)
    n_mb, w_mbs = 64, 8
    n_g8 = n_mb // 8
    cap = 256
    ids = rng.choice(n_mb * 26, cap, replace=False).astype(np.int32)
    lv = rng.integers(-30, 30, (cap, 16)).astype(np.int16)
    args = (jnp.asarray(ids), jnp.asarray(lv),
            jnp.full((n_mb,), 28, jnp.int32), jnp.zeros((n_mb,), jnp.int32),
            jnp.asarray(rng.integers(0, 2, (n_mb, 3)), jnp.int32),
            jnp.asarray(rng.integers(0, 2, n_mb).astype(bool)), n_mb)
    rl_d, rc_d = residual_planes_sparse(*args, luma_rowtile=False)
    rl_t, rc_t = residual_planes_sparse(*args, luma_rowtile=True)

    pl_d = np.asarray(mb_grid_to_plane(rl_d, w_mbs, n_mb // w_mbs))
    pl_t = np.asarray(rl_t.reshape(n_mb // w_mbs, 1, 16, 128)
                      .transpose(0, 2, 1, 3).reshape(-1, 128))
    np.testing.assert_array_equal(pl_t, pl_d)
    for p in range(2):
        pc_d = np.asarray(mb_grid_to_plane(rc_d[:, p], w_mbs,
                                           n_mb // w_mbs))
        pc_t = np.asarray(rc_t[p].reshape(n_mb // w_mbs, 1, 8, 64)
                          .transpose(0, 2, 1, 3).reshape(-1, 64))
        np.testing.assert_array_equal(pc_t, pc_d)


def test_rowtile_cell_scatter_placement_and_padding():
    """The placement-id cell scatter (the round-5 replacement for the
    serialized 2D-window scatter) must land every 4x4 block at its
    pixel position in the tiles, report presence per cell, and keep
    padding entries out of the live region."""
    from h264bsd_tpu.ops.unpack import (rowtile_cell_ids,
                                        rowtile_cell_scatter,
                                        rowtile_cells_to_tiles,
                                        rowtile_present_to_tiles)

    rng = np.random.default_rng(5)
    n_g, n_bands, n_slots = 3, 4, 32        # luma geometry, 24 MBs
    n_cells = n_g * n_bands * n_slots
    cap = 20
    # 12 live blocks at distinct (mb, by, bx) placements + 8 padding
    mb = rng.choice(8 * n_g, 12, replace=False).astype(np.int32)
    by = rng.integers(0, 4, 12).astype(np.int32)
    bx = rng.integers(0, 4, 12).astype(np.int32)
    pids = np.asarray(rowtile_cell_ids(jnp.asarray(mb), jnp.asarray(by),
                                       jnp.asarray(bx), n_bands, n_slots))
    assert len(set(pids.tolist())) == 12     # placements are unique
    pids_full = np.concatenate([pids, np.zeros(cap - 12, np.int32)])
    valid = np.arange(cap) < 12
    upd = rng.integers(1, 100, (cap, 16)).astype(np.int32)
    cells, pres = rowtile_cell_scatter(jnp.asarray(pids_full),
                                       jnp.asarray(valid),
                                       jnp.asarray(upd), n_cells)
    tiles = np.asarray(rowtile_cells_to_tiles(cells, n_g, n_bands,
                                              n_slots))
    mask = np.asarray(rowtile_present_to_tiles(pres, n_g, n_bands,
                                               n_slots))
    want = np.zeros((n_g, 16, 128), np.int32)
    wmask = np.zeros((n_g, 16, 128), bool)
    for k in range(12):
        g, m = mb[k] // 8, mb[k] % 8
        r0, c0 = by[k] * 4, m * 16 + bx[k] * 4
        want[g, r0:r0 + 4, c0:c0 + 4] = upd[k].reshape(4, 4)
        wmask[g, r0:r0 + 4, c0:c0 + 4] = True
    np.testing.assert_array_equal(tiles, want)
    np.testing.assert_array_equal(mask, wmask)
    # padding entries only ever reach spare rows (nothing leaked)
    assert tiles.sum() == upd[:12].sum()
