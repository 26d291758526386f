"""FMO slice-group-map construction: drives the C++ map builder
(decode_slice_group_map, parity with reference h264bsd_slice_group_map.c)
for all 7 map types and checks the spec-mandated patterns."""

import ctypes as ct

import numpy as np

from h264bsd_tpu.frontend.binding import lib


def build_map(w, h, num_groups, map_type, aux=(), change_dir=0,
              change_rate=1, change_cycle=0):
    L = lib()
    fn = L.h264tpu_dev_slice_group_map
    fn.restype = None
    fn.argtypes = [ct.c_uint32, ct.c_uint32,
                   np.ctypeslib.ndpointer(np.uint32),
                   np.ctypeslib.ndpointer(np.uint32), ct.c_uint32,
                   np.ctypeslib.ndpointer(np.uint32)]
    params = np.array([num_groups, map_type, change_dir, change_rate,
                       change_cycle], np.uint32)
    aux_arr = np.asarray(list(aux) or [0], np.uint32)
    out = np.zeros(w * h, np.uint32)
    fn(w, h, params, aux_arr, len(aux_arr), out)
    return out.reshape(h, w)


def test_type0_interleaved():
    m = build_map(6, 4, 2, 0, aux=[2, 1])
    flat = m.reshape(-1)
    expect = []
    while len(expect) < 24:
        expect += [0, 0, 1]
    assert flat.tolist() == expect[:24]


def test_type1_dispersed():
    w, h, g = 8, 6, 3
    m = build_map(w, h, g, 1)
    for i in range(h):
        for j in range(w):
            assert m[i, j] == (j + ((i * g) // 2)) % g


def test_type2_foreground():
    w, h = 8, 6
    m = build_map(w, h, 2, 2, aux=[9, 20])  # rect (1,1)..(2,4)
    inside = np.zeros((h, w), bool)
    inside[1:3, 1:5] = True
    assert (m[inside] == 0).all()
    assert (m[~inside] == 1).all()


def test_type3_boxout():
    w, h = 6, 6
    m = build_map(w, h, 2, 3, change_rate=4, change_cycle=2)
    assert (m == 0).sum() == 8
    ys, xs = np.nonzero(m == 0)
    assert ys.min() >= 1 and ys.max() <= 4 and xs.min() >= 1 and xs.max() <= 4


def test_type4_rasterscan():
    w, h = 6, 4
    m = build_map(w, h, 2, 4, change_rate=5, change_cycle=2)
    flat = m.reshape(-1)
    assert (flat[:10] == 0).all() and (flat[10:] == 1).all()
    m2 = build_map(w, h, 2, 4, change_dir=1, change_rate=5, change_cycle=2)
    flat2 = m2.reshape(-1)
    assert (flat2[:14] == 1).all() and (flat2[14:] == 0).all()


def test_type5_wipe():
    w, h = 6, 4
    m = build_map(w, h, 2, 5, change_rate=4, change_cycle=2)
    assert (m[:, :2] == 0).all() and (m[:, 2:] == 1).all()


def test_type6_explicit():
    w, h = 4, 3
    ids = np.arange(12) % 3
    m = build_map(w, h, 3, 6, aux=ids.tolist())
    assert m.reshape(-1).tolist() == ids.tolist()


def test_single_group():
    m = build_map(5, 5, 1, 0, aux=[0])
    assert (m == 0).all()
