"""Parity-split layout: bit-equality with the interleaved structured ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.ops import parity_stencil as ps
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

pytestmark = pytest.mark.pallas  # interpret-mode kernels off-TPU


@pytest.fixture(scope="module")
def solver():
    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    s = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="interleaved",
        ),
    )
    assert s.structured
    return s


def rand_u(s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((3, s.s_pad)), jnp.float32)


def test_split_merge_roundtrip(solver):
    u = rand_u(solver)
    up = ps.parity_split(u, solver.fine_dims)
    back = ps.parity_merge(up, solver.fine_dims)
    S = int(np.prod(solver.fine_dims))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u)[:, :S])
    # host table split matches the jax split
    tp = ps.parity_split_table(np.asarray(u), solver.fine_dims)
    np.testing.assert_array_equal(tp, np.asarray(up))


def test_parity_k_apply_matches_interleaved(solver):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_window_spmv

    s = solver
    u = rand_u(s, 1)
    ref = pallas_window_spmv(
        s.d["K_vals"], u, s.fine_dims, offsets=s.k_offsets, trim=False
    )
    offs_xyz = ps.decode_offsets(s.k_offsets, s.fine_dims)
    wp = ps.parity_window_tables(
        np.asarray(s.d["K_vals"]), offs_xyz, s.fine_dims
    )
    (cdims, sp) = ps.parity_dims(s.fine_dims)
    pairs = ps.parity_pairs(offs_xyz, cdims)
    up = ps.parity_split(u, s.fine_dims, sp)
    yp = ps.parity_window_apply(jnp.asarray(wp), up, pairs=pairs)
    back = ps.parity_merge(yp, s.fine_dims)
    S = int(np.prod(s.fine_dims))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref)[:, :S], rtol=0, atol=0
    )


def test_parity_grad_compacts_8x_and_matches(solver):
    from cfd_with_cuda_tpu.ops.pallas_stencil import (
        pallas_grad_window,
        window_offsets,
    )
    from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine

    s = solver
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal(s.nnp), jnp.float32)
    pf = coarse_to_fine(p, s.coarse_dims, s.fine_dims)
    sp_fine = s.s_pad
    ref = pallas_grad_window(
        s.d["G_win"], jnp.pad(pf, (0, sp_fine - pf.shape[0])),
        s.fine_dims, s.g_radius, trim=False,
    )

    r = s.g_radius
    offs_xyz = tuple(
        (dx, dy, dz)
        for dz in range(-r, r + 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    )
    cdims, sp = ps.parity_dims(s.fine_dims)
    pairs = ps.parity_pairs(offs_xyz, cdims)
    # one direction at a time through the shared kernel
    outs = []
    for d in range(3):
        wp = ps.parity_window_tables(
            np.asarray(s.d["G_win"])[d], offs_xyz, s.fine_dims
        )
        wp_c, pairs_c = ps.compact_class_tables(wp, pairs)
        assert wp_c.shape[1] <= 27                 # the 8x compaction
        # grad input: pressure IS class (0,0,0) — embed-free
        xp = jnp.zeros((1, 8, sp), jnp.float32)
        xp = xp.at[0, 0, : s.nnp].set(p)
        yp = ps.parity_window_apply(jnp.asarray(wp_c), xp, pairs=pairs_c)
        outs.append(ps.parity_merge(yp, s.fine_dims)[0])
    S = int(np.prod(s.fine_dims))
    # compacted slots accumulate in a different order: f32 FMA noise
    np.testing.assert_allclose(
        np.stack(outs), np.asarray(ref)[:, :S], atol=1e-7
    )
    # every live pair of the compacted grad reads class 0 only
    for cls in pairs_c:
        assert all(pp == 0 for (_, pp, _) in cls)


def test_parity_apply_concat_k_matches(solver):
    """Concat-slot K table (production form): exact vs interleaved."""
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_window_spmv

    s = solver
    u = rand_u(s, 5)
    ref = pallas_window_spmv(
        s.d["K_vals"], u, s.fine_dims, offsets=s.k_offsets, trim=False
    )
    offs_xyz = ps.decode_offsets(s.k_offsets, s.fine_dims)
    wc, pairs = ps.build_parity_apply_tables(
        np.asarray(s.d["K_vals"]), offs_xyz, s.fine_dims
    )
    # Q2 K compacts ~2x: cell-center rows touch 1 element, corners 8
    assert wc.shape[1] < 8 * len(s.k_offsets)
    _, sp = ps.parity_dims(s.fine_dims)
    up = ps.parity_split(u, s.fine_dims, sp)
    yp = ps.parity_apply(jnp.asarray(wc), up, pairs=pairs, co=3, blk=512)
    back = ps.parity_merge(yp, s.fine_dims)
    S = int(np.prod(s.fine_dims))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref)[:, :S], atol=2e-6
    )


def test_parity_apply_concat_grad_matches(solver):
    """Concat-slot G table: all 3 directions in ONE kernel call, input
    is the raw coarse pressure (embed-free)."""
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_grad_window
    from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine

    s = solver
    rng = np.random.default_rng(6)
    p = jnp.asarray(rng.standard_normal(s.nnp), jnp.float32)
    pf = coarse_to_fine(p, s.coarse_dims, s.fine_dims)
    ref = pallas_grad_window(
        s.d["G_win"], jnp.pad(pf, (0, s.s_pad - pf.shape[0])),
        s.fine_dims, s.g_radius, trim=False,
    )
    r = s.g_radius
    offs_xyz = tuple(
        (dx, dy, dz)
        for dz in range(-r, r + 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    )
    wc, pairs = ps.build_parity_apply_tables(
        np.asarray(s.d["G_win"]), offs_xyz, s.fine_dims
    )
    # structural 8x: every (class, offset) plane with mismatched parity
    # is zero, so the concat axis is exactly the one-class slot count
    assert wc.shape[1] == len(offs_xyz)
    assert all(pp == 0 for cls in pairs for (_, pp, _) in cls)
    _, sp = ps.parity_dims(s.fine_dims)
    xp = jnp.pad(p, (0, sp - s.nnp))[None, None]
    yp = ps.parity_apply(jnp.asarray(wc), xp, pairs=pairs, co=3, blk=512)
    back = ps.parity_merge(yp, s.fine_dims)
    S = int(np.prod(s.fine_dims))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref)[:, :S], atol=1e-7
    )


def test_parity_apply_streamed_field_matches_resident(solver):
    """The HBM-streamed field variant (NE85184+ sizes where the class-
    split field no longer fits VMEM next to the weight stream) is
    bit-equal to the VMEM-resident kernel, for both K (C=3, P=8) and
    grad (C=1, P=1) shapes."""
    s = solver
    from cfd_with_cuda_tpu.ops import parity_stencil as ps2

    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    sp_solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="parity",
        ),
    )
    rng = np.random.default_rng(9)
    u = jnp.asarray(
        rng.standard_normal((3, 8, sp_solver.sp_c)), jnp.float32
    )
    y0 = ps2.parity_apply(
        sp_solver.d["Kp"], u, pairs=sp_solver.k_pairs, co=3, stream_x=False
    )
    y1 = ps2.parity_apply(
        sp_solver.d["Kp"], u, pairs=sp_solver.k_pairs, co=3, stream_x=True
    )
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    p = jnp.asarray(rng.standard_normal((1, 1, sp_solver.sp_c)), jnp.float32)
    g0 = ps2.parity_apply(
        sp_solver.d["Gp"], p, pairs=sp_solver.g_pairs, co=3, stream_x=False
    )
    g1 = ps2.parity_apply(
        sp_solver.d["Gp"], p, pairs=sp_solver.g_pairs, co=3, stream_x=True
    )
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_parity_apply_streamed_two_table_matches_resident():
    """wc2 (convection planes) + HBM-streamed field: the second weight
    table streams per block exactly like the first, so the NE85184+
    sizes run the planes route too — bit-equal to the resident kernel."""
    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    s = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="parity",
        ),
    )
    assert s.conv_pairs2 is not None
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((3, 8, s.sp_c)), jnp.float32)
    ne = int(np.prod(s.elem_dims))
    ae = rng.standard_normal((27, 27, ne)).astype(np.float32)
    ae_e = ps.embed_elem_table(ae, s.elem_dims, s.coarse_dims, s.sp_c)
    ae_p = jnp.asarray(ae_e[np.asarray(s.conv_i_order)])
    conv_wc = ps.conv_planes_from_ae(ae_p, groups=s.conv_groups)
    kw = dict(
        pairs=s.k_pairs, co=3, wc2=conv_wc, pairs2=s.conv_pairs2, blk=512
    )
    y0 = ps.parity_apply(s.d["Kp"], u, stream_x=False, **kw)
    y1 = ps.parity_apply(s.d["Kp"], u, stream_x=True, **kw)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_parity_div_matches_compact(solver):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_div_compact

    s = solver
    u = rand_u(s, 7)
    ref = pallas_div_compact(s.d["GT_cwin"], u, s.fine_dims, s.coarse_dims)
    _, sp = ps.parity_dims(s.fine_dims)
    up = ps.parity_split(u, s.fine_dims, sp)
    got = ps.parity_div_apply(s.d["GT_cwin"], up, s.coarse_dims)
    np.testing.assert_array_equal(
        np.asarray(got)[: s.nnp], np.asarray(ref)[: s.nnp]
    )


def test_parity_solver_steps_match_interleaved(solver):
    """End-to-end: the parity-layout solver reproduces the interleaved
    fused solver over 3 time steps (same deck, same CG settings)."""
    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    cfg = dict(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        setup_cache="off", steps_per_chunk=1,
    )
    sp_solver = ExplicitBCHSolver(
        deck, SolverConfig(structured_layout="parity", **cfg)
    )
    assert sp_solver.layout == "parity"
    assert "K_vals" not in sp_solver.d and "G_win" not in sp_solver.d

    import jax

    fn_i = jax.jit(solver._chunk_fn(1))
    fn_p = jax.jit(sp_solver._chunk_fn(1))
    st_i = solver.initial_state()
    st_p = sp_solver.initial_state()
    for _ in range(3):
        st_i, packed_i = fn_i(solver.d, st_i)
        st_p, packed_p = fn_p(sp_solver.d, st_p)
    u_i, p_i = solver.fields(st_i)
    u_p, p_p = sp_solver.fields(st_p)
    np.testing.assert_allclose(u_p, u_i, atol=5e-6)
    np.testing.assert_allclose(p_p, p_i, atol=5e-5)
    mi = np.asarray(packed_i)
    mp = np.asarray(packed_p)
    np.testing.assert_allclose(mp[:5], mi[:5], atol=5e-6)   # monitors
    assert mi[6] == mp[6]                                   # cg iters


def test_parity_solver_state_roundtrip(solver):
    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    sp_solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="parity",
        ),
    )
    rng = np.random.default_rng(8)
    u = rng.standard_normal((sp_solver.nn, 3)).astype(np.float32)
    p = rng.standard_normal(sp_solver.nnp).astype(np.float32)
    st = sp_solver.state_from_fields(u, p)
    assert st.un.shape == (3, 8, sp_solver.sp_c)
    u2, p2 = sp_solver.fields(st)
    np.testing.assert_allclose(u2, u, atol=1e-7)
    np.testing.assert_allclose(p2, p, atol=1e-7)


def test_implicit_parity_solver_steps_match_interleaved():
    """Implicit GQ on the parity layout reproduces the interleaved fused
    solver over 3 steps: same CG + momentum iteration counts, fields
    equal to solver tolerance (the BiCGStab runs through different op
    orders, so agreement is tolerance-level, not bitwise)."""
    import jax

    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    deck = cavity_deck(4, viscosity=0.01, dt=0.01)
    cfg = dict(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        setup_cache="off", steps_per_chunk=1,
    )
    si = ImplicitGQSolver(
        deck, SolverConfig(structured_layout="interleaved", **cfg)
    )
    sp_solver = ImplicitGQSolver(
        deck, SolverConfig(structured_layout="parity", **cfg)
    )
    assert sp_solver.layout == "parity"
    assert "MK_vals" not in sp_solver.d and "G_win" not in sp_solver.d

    fn_i = jax.jit(si._chunk_fn(1))
    fn_p = jax.jit(sp_solver._chunk_fn(1))
    st_i = si.initial_state()
    st_p = sp_solver.initial_state()
    for _ in range(3):
        st_i, packed_i = fn_i(si.d, st_i)
        st_p, packed_p = fn_p(sp_solver.d, st_p)
    u_i, p_i = si.fields(st_i)
    u_p, p_p = sp_solver.fields(st_p)
    np.testing.assert_allclose(u_p, u_i, atol=5e-5)
    np.testing.assert_allclose(p_p, p_i, atol=5e-5)
    mi = np.asarray(packed_i)
    mp = np.asarray(packed_p)
    # monitors (rtol covers the O(1) max_acc row: the grouped assembly
    # sums elemental contributions in a different FP order)
    np.testing.assert_allclose(mp[:5], mi[:5], atol=5e-5, rtol=2e-4)
    # iteration counts: equal up to one unroll group / one BiCGStab
    # iteration (FP-order noise at the residual-check boundary)
    assert abs(float(mi[6].ravel()[0]) - float(mp[6].ravel()[0])) <= 4.0
    assert abs(float(mi[7].ravel()[0]) - float(mp[7].ravel()[0])) <= 1.0


def test_explicit_parity_conv_planes_matches_matrix_free():
    """The parity default ('auto' -> all-Pallas conv planes: A(un)
    streamed as 729 weight planes through the K parity_apply) matches
    the flat matrix-free form to FP-order noise."""
    import jax

    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    base = dict(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        setup_cache="off", structured_layout="parity", steps_per_chunk=1,
    )
    s_mf = ExplicitBCHSolver(deck, SolverConfig(conv_mode="matrix-free", **base))
    s_as = ExplicitBCHSolver(deck, SolverConfig(**base))
    assert s_as.conv_groups
    fn_mf = jax.jit(s_mf._chunk_fn(1))
    fn_as = jax.jit(s_as._chunk_fn(1))
    st_mf = s_mf.initial_state()
    st_as = s_as.initial_state()
    for _ in range(3):
        st_mf, _ = fn_mf(s_mf.d, st_mf)
        st_as, _ = fn_as(s_as.d, st_as)
    u0, p0 = s_mf.fields(st_mf)
    u1, p1 = s_as.fields(st_as)
    np.testing.assert_allclose(u1, u0, atol=5e-5)
    np.testing.assert_allclose(p1, p0, atol=5e-5)


def test_conv_plane_merge_matches_per_pair_loop():
    """The implicit scatter-free LHS convection (conv_planes_from_ae +
    the conv_sel merge matmul) equals the literal
    one-scatter-per-(i,j)-pair numpy reference: each elemental channel
    pair (i, j) lands in ONE concat-slot plane at ONE fixed coarse
    offset di = oi >> 1."""
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    deck = cavity_deck(4, viscosity=0.01, dt=0.01)
    s = ImplicitGQSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="parity",
        ),
    )
    assert s.layout == "parity" and s.conv_groups
    rng = np.random.default_rng(3)
    ne = int(np.prod(s.elem_dims))
    ae = rng.standard_normal((27, 27, ne)).astype(np.float32)
    n_planes = int(s.d["MKp"].shape[1])
    # new path: embed on the coarse-flat axis, i channels in conv_i_order
    ae_e = ps.embed_elem_table(ae, s.elem_dims, s.coarse_dims, s.sp_c)
    ae_p = jnp.asarray(ae_e[np.asarray(s.conv_i_order)])
    conv_wc = ps.conv_planes_from_ae(ae_p, groups=s.conv_groups)
    got = np.asarray(
        jnp.einsum("pj,js->ps", jnp.asarray(s.d["conv_sel"]), conv_wc[0])
    )[None]
    # independent per-pair reference on the 3-D coarse boxes
    ex, ey, ez = s.elem_dims
    cx, cy, cz = s.coarse_dims
    cls = lambda o: ((o[2] & 1) * 2 + (o[1] & 1)) * 2 + (o[0] & 1)
    ref = np.zeros((n_planes, cz, cy, cx), np.float32)
    for i, oi in enumerate(s.local_off):
        di = (oi[0] >> 1, oi[1] >> 1, oi[2] >> 1)
        for j, oj in enumerate(s.local_off):
            dj = (oj[0] >> 1, oj[1] >> 1, oj[2] >> 1)
            dq = ((dj[2] - di[2]) * cy + (dj[1] - di[1])) * cx + (
                dj[0] - di[0]
            )
            hits = [
                jj for (jj, pp, dd) in s.a_pairs[cls(oi)]
                if pp == cls(oj) and dd == dq
            ]
            assert len(hits) == 1
            ref[hits[0], di[2]:di[2] + ez, di[1]:di[1] + ey,
                di[0]:di[0] + ex] += ae[i, j].reshape(ez, ey, ex)
    ref = np.pad(
        ref.reshape(n_planes, -1), ((0, 0), (0, s.sp_c - cx * cy * cz))
    )[None]
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_implicit_parity_state_roundtrip():
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    deck = cavity_deck(4, viscosity=0.01, dt=0.01)
    sp_solver = ImplicitGQSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="parity",
        ),
    )
    rng = np.random.default_rng(12)
    u = rng.standard_normal((sp_solver.nn, 3)).astype(np.float32)
    p = rng.standard_normal(sp_solver.nnp).astype(np.float32)
    st = sp_solver.state_from_fields(u, p)
    assert st.uk.shape == (3, 8, sp_solver.sp_c)
    u2, p2 = sp_solver.fields(st)
    np.testing.assert_allclose(u2, u, atol=1e-7)
    np.testing.assert_allclose(p2, p, atol=1e-7)


def test_parity_elem_gather_scatter_match(solver):
    from cfd_with_cuda_tpu.ops.stencil import (
        gather_elem_stencil,
        scatter_elem_stencil,
    )

    s = solver
    assert s.elem_structured
    u = rand_u(s, 3)
    cdims, sp = ps.parity_dims(s.fine_dims)
    S = int(np.prod(s.fine_dims))

    ref_g = gather_elem_stencil(u[:, :S], s.elem_dims, s.fine_dims)
    up = ps.parity_split(u, s.fine_dims, sp)
    got_g = ps.parity_gather_elem(up, s.elem_dims, cdims)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))

    rng = np.random.default_rng(4)
    ne = int(np.prod(s.elem_dims))
    r_e = jnp.asarray(rng.standard_normal((3, 27, ne)), jnp.float32)
    ref_s = scatter_elem_stencil(r_e, s.local_off, s.elem_dims, s.fine_dims)
    got_s = ps.parity_scatter_elem(r_e, s.elem_dims, cdims, sp)
    back = ps.parity_merge(got_s, s.fine_dims)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref_s)[:, :S], atol=1e-5
    )


def test_flat_elemental_ops_match_box_forms(solver):
    """The FLAT minor-axis-shift elemental gather/scatter (round 4:
    replaces the tile-hostile 3-D box slice/DUS forms in the parity
    convection) agrees with the box forms at element positions, and the
    whole embedded-axis matrix-free convection apply reproduces the
    NE-axis one exactly."""
    s = solver
    assert s.elem_structured
    cdims, sp = ps.parity_dims(s.fine_dims)
    u = rand_u(s, 7)
    up = ps.parity_split(u, s.fine_dims, sp)

    # gather: flat form at embedded element positions == box form
    box_g = np.asarray(ps.parity_gather_elem(up, s.elem_dims, cdims))
    flat_g = np.asarray(ps.parity_gather_elem_flat(up, cdims))
    ex, ey, ez = s.elem_dims
    cx, cy, cz = cdims
    emb = (
        np.arange(ex)[None, None, :]
        + cx * (np.arange(ey)[None, :, None] + cy * np.arange(ez)[:, None, None])
    ).ravel()
    np.testing.assert_array_equal(flat_g[..., emb], box_g)

    # scatter: r_e embedded on the coarse axis scatters to the same field
    rng = np.random.default_rng(8)
    ne = int(np.prod(s.elem_dims))
    r_e = jnp.asarray(rng.standard_normal((3, 27, ne)), jnp.float32)
    r_e_flat = jnp.zeros((3, 27, sp), jnp.float32).at[..., emb].set(r_e)
    box_s = np.asarray(ps.parity_scatter_elem(r_e, s.elem_dims, cdims, sp))
    flat_s = np.asarray(ps.parity_scatter_elem_flat(r_e_flat, cdims))
    np.testing.assert_allclose(flat_s, box_s, atol=1e-6)

    # embedded element tables: zero outside element positions
    t = np.asarray(
        ps.embed_elem_table(
            np.arange(ne, dtype=np.float32) + 1.0, s.elem_dims, cdims, sp
        )
    )
    assert np.array_equal(np.flatnonzero(t), emb)


def test_conv_planes_route_matches_matrix_free():
    """conv_mode='planes' (all-Pallas K+A via the second weight table)
    reproduces the flat matrix-free parity solver over 3 time steps at
    identical CG iteration counts."""
    import jax

    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    cfg = dict(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        setup_cache="off", steps_per_chunk=1,
        structured_layout="parity",
    )
    s_mf = ExplicitBCHSolver(
        deck, SolverConfig(conv_mode="matrix-free", **cfg)
    )
    s_pl = ExplicitBCHSolver(deck, SolverConfig(conv_mode="planes", **cfg))
    fn_m = jax.jit(s_mf._chunk_fn(1))
    fn_p = jax.jit(s_pl._chunk_fn(1))
    st_m = s_mf.initial_state()
    st_p = s_pl.initial_state()
    for _ in range(3):
        st_m, packed_m = fn_m(s_mf.d, st_m)
        st_p, packed_p = fn_p(s_pl.d, st_p)
    u_m, p_m = s_mf.fields(st_m)
    u_p, p_p = s_pl.fields(st_p)
    np.testing.assert_allclose(u_p, u_m, atol=5e-6)
    np.testing.assert_allclose(p_p, p_m, atol=5e-5)
    mm, mp = np.asarray(packed_m), np.asarray(packed_p)
    np.testing.assert_allclose(mp[:5], mm[:5], atol=5e-6)
    assert mm[6] == mp[6]                                   # cg iters


def test_implicit_parity_mixed_policy_matches_f32():
    """DTypePolicy.MIXED (f32 state + f64/compensated Krylov reductions)
    on the implicit parity path: runs, stays finite, and tracks the F32
    run to reduction-precision level."""
    import jax

    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    deck = cavity_deck(4, viscosity=0.01, dt=0.01)
    outs = {}
    for pol in (DTypePolicy.F32, DTypePolicy.MIXED):
        s = ImplicitGQSolver(
            deck,
            SolverConfig(
                dtype_policy=pol, pressure_backend="pallas",
                setup_cache="off", structured_layout="parity",
                steps_per_chunk=2,
            ),
        )
        assert s.layout == "parity"
        fn = jax.jit(s._chunk_fn(2))
        st = s.initial_state()
        for _ in range(2):
            st, _ = fn(s.d, st)
        outs[pol] = s.fields(st)
    u32, p32 = outs[DTypePolicy.F32]
    umx, pmx = outs[DTypePolicy.MIXED]
    assert np.isfinite(umx).all() and np.isfinite(pmx).all()
    np.testing.assert_allclose(umx, u32, atol=5e-5)
    np.testing.assert_allclose(pmx, p32, atol=5e-4)


def test_explicit_sym_cg_stream_matches_full():
    """pressure_cg_sym=True (half-window streamed fused CG) reproduces
    the full-window solver step: same CG iterations, fields equal."""
    import jax

    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    base = dict(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        setup_cache="off", steps_per_chunk=1,
    )
    outs = {}
    for sym in (False, True):
        s = ExplicitBCHSolver(deck, SolverConfig(pressure_cg_sym=sym, **base))
        fn = jax.jit(s._chunk_fn(1))
        st = s.initial_state()
        for _ in range(3):
            st, pk = fn(s.d, st)
        outs[sym] = (s.fields(st), np.asarray(pk).ravel())
    (u0, p0), m0 = outs[False]
    (u1, p1), m1 = outs[True]
    np.testing.assert_allclose(u1, u0, atol=1e-5)
    np.testing.assert_allclose(p1, p0, atol=1e-5)
    assert abs(float(m0[6]) - float(m1[6])) <= 4       # cg iters
