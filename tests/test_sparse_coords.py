import numpy as np
import pytest

from box2mask_tpu.sparse import coords as C


def random_coords(n, lo=0, hi=60, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.integers(lo, hi, size=(n, 3))
    return np.unique(c, axis=0)


def brute_neighbor_map(out_coords, in_coords, offsets):
    table = {tuple(c): i for i, c in enumerate(in_coords)}
    m = np.full((len(out_coords), len(offsets)), -1, np.int64)
    for v, c in enumerate(out_coords):
        for k, off in enumerate(offsets):
            m[v, k] = table.get(tuple(c + off), -1)
    return m


def test_neighbor_map_matches_bruteforce():
    c = random_coords(200)
    keys = np.unique(C.pack(c))
    c_sorted = C._unpack(keys)
    offs = C.kernel_offsets(3, 1)
    got = C.neighbor_map(c_sorted, keys, offs)
    want = brute_neighbor_map(c_sorted, c_sorted, offs)
    np.testing.assert_array_equal(got, want)


def test_kernel_offsets_shapes_and_center():
    o3 = C.kernel_offsets(3, 1)
    assert o3.shape == (27, 3)
    assert (o3.min(), o3.max()) == (-1, 1)
    # center offset present exactly once
    assert (np.all(o3 == 0, axis=1)).sum() == 1
    o2 = C.kernel_offsets(2, 4)
    assert o2.shape == (8, 3)
    assert set(np.unique(o2)) == {0, 4}
    o5 = C.kernel_offsets(5, 1)
    assert o5.shape == (125, 3)


def test_pyramid_levels_are_floored_multiples():
    c = random_coords(500, hi=200, seed=1)
    pyr = C.build_scene_pyramid(c)
    for l in range(C.NUM_LEVELS):
        cl = pyr[f'coords{l}']
        assert (cl % (1 << l) == 0).all()
        assert len(np.unique(C.pack(cl))) == len(cl)
    # level l+1 coords == unique floor of level l coords
    for l in range(C.NUM_LEVELS - 1):
        want = np.unique(pyr[f'coords{l}'] & ~np.int32((1 << (l + 1)) - 1), axis=0)
        got = pyr[f'coords{l + 1}']
        assert {tuple(r) for r in got} == {tuple(r) for r in want}


def test_down_up_maps_are_inverses():
    c = random_coords(400, hi=100, seed=2)
    pyr = C.build_scene_pyramid(c)
    for l in range(C.NUM_LEVELS - 1):
        down = pyr[f'down{l}']          # (V_{l+1}, 8)
        parent = pyr[f'up_parent{l}']   # (V_l,)
        widx = pyr[f'up_widx{l}']       # (V_l,)
        # the down map of my parent at my weight slot is me
        for v in range(len(parent)):
            assert down[parent[v], widx[v]] == v
        # every non-missing down entry round-trips
        for u in range(down.shape[0]):
            for k in range(8):
                r = down[u, k]
                if r >= 0:
                    assert parent[r] == u and widx[r] == k


def test_batch_pyramids_offsets_and_sentinels():
    p1 = C.build_scene_pyramid(random_coords(150, seed=3))
    p2 = C.build_scene_pyramid(random_coords(220, seed=4))
    bucket = 128
    b = C.batch_pyramids([p1, p2], vox_bucket=bucket)
    n1, n2 = int(p1['num0']), int(p2['num0'])
    tot = n1 + n2
    pad = C.round_up(tot, bucket)
    assert b['coords0'].shape[0] == pad
    assert int(b['num0']) == tot
    assert b['valid0'].sum() == tot
    assert (b['batch0'][:n1] == 0).all() and (b['batch0'][n1:tot] == 1).all()
    # scene-2 maps shifted by n1; all indices either valid-in-scene or == sentinel
    m = b['nmap3_0']
    sent = pad
    assert (m[:n1] <= sent).all()
    in_scene2 = m[n1:tot]
    ok = (in_scene2 == sent) | ((in_scene2 >= n1) & (in_scene2 < tot))
    assert ok.all()
    # padded output rows are all-sentinel
    assert (m[tot:] == sent).all()
    # spot-check scene-2 row 0 equals its unbatched map shifted
    raw = p2['nmap3_0'][0]
    want = np.where(raw < 0, sent, raw + n1)
    np.testing.assert_array_equal(m[n1], want)


def test_batch_pyramid_single_scene_roundtrip():
    c = random_coords(100, seed=5)
    pyr = C.build_scene_pyramid(c)
    b = C.batch_pyramids([pyr], vox_bucket=64)
    n = int(pyr['num0'])
    np.testing.assert_array_equal(b['coords0'][:n], pyr['coords0'])
