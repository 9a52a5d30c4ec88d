"""SPVCNN sparse point-voxel classifier (scade_tpu/prior/spvcnn.py).

The reference's own copy is un-importable (lib/spvcnn_utils.py imports
torchsparse modules that don't exist in any installable version here), so
instead of goldens these tests pin correctness by construction:

- sparse_match / sparse_unique vs literal numpy dict/unique oracles
- sparse conv (stride 1 and 2) vs dense `lax.conv_general_dilated` on a
  fully-occupied voxel block (sparse-with-all-sites == dense conv)
- voxel_to_point vs direct trilinear interpolation on a dense grid
- classifier: padding- and permutation-invariance, finite logits
- the depth→pcd→sparse-tensor drivers and refine_focal/refine_shift
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scade_tpu.prior.spvcnn import (
    SPVCNNConfig,
    SparsePoints,
    SparseVoxels,
    _kernel_offsets,
    batch_norm_masked,
    depth_to_pcd,
    global_avg_pool,
    init_image_coor,
    init_spvcnn,
    initial_voxelize,
    pcd_to_sparsetensor,
    pcd_uv_to_sparsetensor,
    point_to_voxel,
    refine_focal,
    refine_shift,
    sparse_conv3d,
    sparse_conv3d_transpose,
    sparse_match,
    sparse_unique,
    spvcnn_apply,
    voxel_to_point,
)


def _rand_coords(rng, n, lo=-6, hi=6, batches=2):
    c = rng.randint(lo, hi, size=(n, 3))
    b = rng.randint(0, batches, size=(n, 1))
    return np.concatenate([c, b], 1).astype(np.int32)


def test_sparse_match_vs_dict():
    rng = np.random.RandomState(0)
    table = _rand_coords(rng, 64)
    # dedupe table rows (sparse sites are unique)
    _, keep = np.unique(table, axis=0, return_index=True)
    tmask = np.zeros(64, bool)
    tmask[keep] = True
    query = _rand_coords(rng, 96)
    qmask = rng.rand(96) > 0.2
    got = np.asarray(sparse_match(jnp.asarray(table), jnp.asarray(tmask),
                                  jnp.asarray(query), jnp.asarray(qmask)))
    lut = {tuple(c): i for i, c in enumerate(table) if tmask[i]}
    want = np.array([
        lut.get(tuple(q), -1) if qmask[i] else -1
        for i, q in enumerate(query)
    ])
    np.testing.assert_array_equal(got, want)


def test_sparse_unique_vs_numpy():
    rng = np.random.RandomState(1)
    coords = _rand_coords(rng, 80, lo=-3, hi=3)
    mask = rng.rand(80) > 0.3
    uc, um, inv, counts = (np.asarray(a) for a in
                           sparse_unique(jnp.asarray(coords),
                                         jnp.asarray(mask)))
    ref_unique, ref_counts = np.unique(coords[mask], axis=0,
                                       return_counts=True)
    n = ref_unique.shape[0]
    assert um.sum() == n
    # same set of coords (order may differ), counts consistent
    got = {tuple(c): k for c, k in zip(uc[:n], counts[:n])}
    want = {tuple(c): k for c, k in zip(ref_unique, ref_counts)}
    assert got == want
    # inverse maps every valid row back to its own coord
    for i in range(80):
        if mask[i]:
            assert tuple(uc[inv[i]]) == tuple(coords[i])
        else:
            assert inv[i] == -1


def _dense_block_sparse(rng, d, cin, batches=1):
    """All sites of a d³ grid as a SparseVoxels (capacity = exact)."""
    g = np.stack(np.meshgrid(*([np.arange(d)] * 3), indexing="ij"),
                 -1).reshape(-1, 3)
    coords, feats = [], []
    for b in range(batches):
        coords.append(np.concatenate(
            [g, np.full((g.shape[0], 1), b)], 1))
        feats.append(rng.randn(g.shape[0], cin))
    coords = np.concatenate(coords).astype(np.int32)
    feats = np.concatenate(feats).astype(np.float32)
    x = SparseVoxels(jnp.asarray(feats), jnp.asarray(coords),
                     jnp.ones((coords.shape[0],), bool), 1)
    dense = np.zeros((batches, d, d, d, cin), np.float32)
    dense[coords[:, 3], coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return x, dense


def test_sparse_conv_stride1_matches_dense():
    rng = np.random.RandomState(2)
    d, cin, cout, ks = 5, 3, 4, 3
    x, dense = _dense_block_sparse(rng, d, cin, batches=2)
    w = jnp.asarray(rng.randn(ks ** 3, cin, cout).astype(np.float32))
    y = sparse_conv3d(x, w, ks=ks, stride=1)
    # dense oracle with SAME zero padding: sparse sees absent neighbours
    # as zero-features, identical to zero padding on a full block.
    # dimension mapping: dense is (B, x, y, z, C); the conv kernel axis
    # order must match offset axis order. offset k runs (iz, iy, ix) with
    # offset=(r[ix], r[iy], r[iz]) applied to (x, y, z): out[c] += W[k] ·
    # in[c + off] — a correlation with flipped sign vs conv. Use explicit
    # gather-based oracle instead (literal semantics):
    pad = ks // 2
    dpad = np.pad(dense, ((0, 0), (pad, pad), (pad, pad), (pad, pad),
                          (0, 0)))
    offs = _kernel_offsets(ks, 1)
    want = np.zeros((dense.shape[0], d, d, d, cout), np.float32)
    wnp = np.asarray(w)
    for k, (ox, oy, oz) in enumerate(offs):
        sl = dpad[:, pad + ox:pad + ox + d, pad + oy:pad + oy + d,
                  pad + oz:pad + oz + d, :]
        want += sl @ wnp[k]
    got = np.asarray(y.feats)
    coords = np.asarray(y.coords)
    for i in range(coords.shape[0]):
        xx, yy, zz, b = coords[i]
        np.testing.assert_allclose(got[i], want[b, xx, yy, zz], rtol=2e-5,
                                   atol=2e-5)


def test_sparse_conv_stride2_downsample():
    rng = np.random.RandomState(3)
    d, cin, cout = 4, 2, 3
    x, dense = _dense_block_sparse(rng, d, cin)
    w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32))
    y = sparse_conv3d(x, w, ks=2, stride=2)
    assert y.stride == 2
    coords = np.asarray(y.coords)[np.asarray(y.mask)]
    # output sites are the unique floor(c/2)*2 — the 2³ even corners
    assert sorted(map(tuple, coords)) == sorted(
        (2 * i, 2 * j, 2 * k, 0)
        for i in range(d // 2) for j in range(d // 2)
        for k in range(d // 2))
    # literal oracle: out[c] = Σ_{o∈{0,1}³} in[c+o] @ W[o]
    offs = _kernel_offsets(2, 1)
    wnp = np.asarray(w)
    got = np.asarray(y.feats)
    for i, m in enumerate(np.asarray(y.mask)):
        if not m:
            continue
        cx, cy, cz, b = np.asarray(y.coords)[i]
        want = np.zeros(cout, np.float32)
        for k, (ox, oy, oz) in enumerate(offs):
            want += dense[b, cx + ox, cy + oy, cz + oz] @ wnp[k]
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=2e-5)


def test_voxel_to_point_trilinear_oracle():
    rng = np.random.RandomState(4)
    d, c = 4, 3
    x, dense = _dense_block_sparse(rng, d, c)
    npts = 16
    pts = rng.rand(npts, 3).astype(np.float32) * (d - 1)
    fc = np.concatenate([pts, np.zeros((npts, 1), np.float32)], 1)
    z = SparsePoints(jnp.zeros((npts, c)), jnp.asarray(fc),
                     jnp.ones((npts,), bool))
    out = np.asarray(voxel_to_point(x, z).feats)
    for i in range(npts):
        p = pts[i]
        base = np.floor(p).astype(int)
        frac = p - base
        want = np.zeros(c)
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    cc = base + (ox, oy, oz)
                    if np.all(cc < d):
                        w = ((frac[0] if ox else 1 - frac[0])
                             * (frac[1] if oy else 1 - frac[1])
                             * (frac[2] if oz else 1 - frac[2]))
                        want += w * dense[0, cc[0], cc[1], cc[2]]
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-5)


def test_initial_voxelize_means_points():
    # two points in the same voxel average; pres/vres rescales coords
    feats = jnp.asarray([[1.0, 0.0], [3.0, 0.0], [0.0, 8.0]])
    fc = jnp.asarray([
        [0.2, 0.3, 0.4, 0.0],
        [0.6, 0.7, 0.9, 0.0],  # same floor voxel (0,0,0)
        [2.5, 0.1, 0.1, 0.0],
    ])
    z = SparsePoints(feats, fc, jnp.ones((3,), bool))
    x, z2 = initial_voxelize(z, init_res=1.0, after_res=1.0)
    vm = np.asarray(x.mask)
    assert vm.sum() == 2
    got = {tuple(c[:3]): tuple(f) for c, f, m in
           zip(np.asarray(x.coords), np.asarray(x.feats), vm) if m}
    np.testing.assert_allclose(got[(0, 0, 0)], (2.0, 0.0))
    np.testing.assert_allclose(got[(2, 0, 0)], (0.0, 8.0))
    # round trip: point_to_voxel puts the same means back
    x2 = point_to_voxel(x, z2)
    np.testing.assert_allclose(np.asarray(x2.feats), np.asarray(x.feats),
                               atol=1e-6)


def test_initial_voxelize_pres_vres_rescale():
    # spvcnn_utils.py:13-14: new coords = (C * init_res) / after_res
    feats = jnp.asarray([[1.0], [2.0]])
    fc = jnp.asarray([[3.0, 1.0, 5.0, 0.0], [3.2, 1.2, 5.2, 0.0]])
    z = SparsePoints(feats, fc, jnp.ones((2,), bool))
    x, z2 = initial_voxelize(z, init_res=0.5, after_res=1.0)
    np.testing.assert_allclose(np.asarray(z2.fcoords)[:, :3],
                               np.asarray(fc)[:, :3] * 0.5, rtol=1e-6)
    got = {tuple(c[:3]) for c, m in zip(np.asarray(x.coords),
                                        np.asarray(x.mask)) if m}
    assert got == {(1, 0, 2)}  # both points land in floor voxel (1,0,2)
    f = np.asarray(x.feats)[np.asarray(x.mask)]
    np.testing.assert_allclose(f, [[1.5]], rtol=1e-6)


def test_deconv_upsamples_onto_finer_sites():
    rng = np.random.RandomState(5)
    x, _ = _dense_block_sparse(rng, 4, 2)
    w_down = jnp.asarray(rng.randn(8, 2, 3).astype(np.float32))
    y = sparse_conv3d(x, w_down, ks=2, stride=2)
    w_up = jnp.asarray(rng.randn(8, 3, 2).astype(np.float32))
    up = sparse_conv3d_transpose(y, w_up, out_sites=x, ks=2)
    assert up.stride == 1
    np.testing.assert_array_equal(np.asarray(up.coords),
                                  np.asarray(x.coords))
    # every fine site c receives exactly its parent floor(c/2)*2 through
    # the offset o = c - parent
    got = np.asarray(up.feats)
    yc = {tuple(c): f for c, f, m in zip(np.asarray(y.coords),
                                         np.asarray(y.feats),
                                         np.asarray(y.mask)) if m}
    offs = _kernel_offsets(2, 1)
    wnp = np.asarray(w_up)
    for i, c in enumerate(np.asarray(x.coords)):
        parent = (c[0] // 2 * 2, c[1] // 2 * 2, c[2] // 2 * 2, c[3])
        o = (c[0] - parent[0], c[1] - parent[1], c[2] - parent[2])
        k = next(j for j, v in enumerate(offs) if tuple(v) == o)
        np.testing.assert_allclose(got[i], yc[parent] @ wnp[k],
                                   rtol=2e-5, atol=2e-5)


def _toy_points(rng, n, cap, cin=3, batches=1, scale=4.0):
    pts = (rng.rand(n, 3) * scale).astype(np.float32)
    b = rng.randint(0, batches, size=(n, 1)).astype(np.float32)
    feats = np.zeros((cap, cin), np.float32)
    fc = np.zeros((cap, 4), np.float32)
    feats[:n] = rng.randn(n, cin)
    fc[:n] = np.concatenate([pts, b], 1)
    mask = np.arange(cap) < n
    return SparsePoints(jnp.asarray(feats), jnp.asarray(fc),
                        jnp.asarray(mask))


@pytest.fixture(scope="module")
def tiny_net():
    cfg = SPVCNNConfig(input_channel=3, num_classes=1, cr=0.25,
                       pres=1.0, vres=1.0)
    params = init_spvcnn(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_classifier_forward_finite_and_padding_invariant(tiny_net):
    cfg, params = tiny_net
    rng = np.random.RandomState(6)
    z1 = _toy_points(rng, 40, cap=48)
    out1 = np.asarray(spvcnn_apply(params, cfg, z1, num_batches=1))
    assert out1.shape == (1, 1) and np.all(np.isfinite(out1))
    # same points, more padding capacity → identical logits
    z2 = SparsePoints(
        jnp.concatenate([z1.feats, jnp.zeros((16, 3))]),
        jnp.concatenate([z1.fcoords, jnp.zeros((16, 4))]),
        jnp.concatenate([z1.mask, jnp.zeros((16,), bool)]),
    )
    out2 = np.asarray(spvcnn_apply(params, cfg, z2, num_batches=1))
    np.testing.assert_allclose(out2, out1, rtol=1e-4, atol=1e-5)


def test_classifier_permutation_invariant(tiny_net):
    cfg, params = tiny_net
    rng = np.random.RandomState(7)
    n, cap = 40, 40
    z = _toy_points(rng, n, cap)
    out = np.asarray(spvcnn_apply(params, cfg, z, num_batches=1))
    perm = rng.permutation(n)
    zp = SparsePoints(z.feats[perm], z.fcoords[perm], z.mask[perm])
    outp = np.asarray(spvcnn_apply(params, cfg, zp, num_batches=1))
    np.testing.assert_allclose(outp, out, rtol=1e-4, atol=1e-5)


def test_classifier_batched(tiny_net):
    cfg, params = tiny_net
    rng = np.random.RandomState(8)
    z = _toy_points(rng, 60, cap=64, batches=2)
    out = np.asarray(spvcnn_apply(params, cfg, z, num_batches=2))
    assert out.shape == (2, 1) and np.all(np.isfinite(out))


def test_masked_bn_and_gap_ignore_padding():
    rng = np.random.RandomState(9)
    f = rng.randn(10, 4).astype(np.float32)
    m = np.arange(10) < 7
    y = np.asarray(batch_norm_masked(jnp.asarray(f), jnp.asarray(m),
                                     jnp.ones(4), jnp.zeros(4)))
    valid = y[:7]
    np.testing.assert_allclose(valid.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(valid.std(0), 1, atol=1e-3)
    np.testing.assert_allclose(y[7:], 0, atol=0)
    coords = np.zeros((10, 4), np.int32)
    coords[:, 3] = 0
    x = SparseVoxels(jnp.asarray(f), jnp.asarray(coords), jnp.asarray(m), 1)
    g = np.asarray(global_avg_pool(x, 1))
    np.testing.assert_allclose(g[0], f[:7].mean(0), rtol=1e-5, atol=1e-6)


def test_depth_pcd_drivers_and_refinement(tiny_net):
    cfg, params = tiny_net
    rng = np.random.RandomState(10)
    H, W = 12, 16
    depth = (rng.rand(H, W).astype(np.float32) + 0.5)
    depth[0, :] = 0.0  # invalid band
    u_u0, v_v0 = init_image_coor(H, W)
    pcd, valid = depth_to_pcd(depth.copy(), u_u0, v_v0, f=20.0)
    assert valid.sum() == (H - 1) * W
    pts = pcd_to_sparsetensor(pcd, valid, voxel_size=0.25, num_points=64)
    assert pts.feats.shape == (64, 3)
    ptsuv = pcd_uv_to_sparsetensor(pcd, u_u0, v_v0, valid, f=20.0,
                                   voxel_size=0.25, num_points=64)
    assert ptsuv.feats.shape == (64, 5)

    cfg5 = SPVCNNConfig(input_channel=5, num_classes=1, cr=0.25)
    params5 = init_spvcnn(jax.random.PRNGKey(1), cfg5)

    def apply3(p):
        return spvcnn_apply(params, cfg, p, num_batches=1)

    def apply5(p):
        return spvcnn_apply(params5, cfg5, p, num_batches=1)

    # monkeypatch the drivers' capacity for test speed
    import scade_tpu.prior.spvcnn as sp
    orig = sp.pcd_uv_to_sparsetensor, sp.pcd_to_sparsetensor
    try:
        sp.pcd_uv_to_sparsetensor = (
            lambda *a, **k: orig[0](*a, **{**k, "num_points": 64}))
        sp.pcd_to_sparsetensor = (
            lambda *a, **k: orig[1](*a, **{**k, "num_points": 64}))
        focal, scale = refine_focal(depth, 20.0, apply5, u0=W / 2,
                                    v0=H / 2)
        assert np.isfinite(focal) and focal == pytest.approx(20.0 / scale)
        shift = refine_shift(depth, apply3, 20.0, u0=W / 2, v0=H / 2)
        assert np.isfinite(shift) and shift <= 0.7
    finally:
        sp.pcd_uv_to_sparsetensor, sp.pcd_to_sparsetensor = orig


def test_conv_block_jits(tiny_net):
    """One conv block under jit — the static-shape contract holds."""
    rng = np.random.RandomState(11)
    x, _ = _dense_block_sparse(rng, 3, 3)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32))

    @jax.jit
    def f(feats):
        y = sparse_conv3d(x._replace(feats=feats), w, ks=3)
        return y.feats

    out = np.asarray(f(x.feats))
    ref = np.asarray(sparse_conv3d(x, w, ks=3).feats)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
