"""Triangle-mesh path tests: Möller-Trumbore, instancing, interpolation."""

import jax.numpy as jnp
import numpy as np

from drts_tpu.models import geometry
from drts_tpu.ops import intersect, trimesh
from drts_tpu.utils import math as m


def _unit_geosphere(tess=3):
    pos, nrm, uv, idx = geometry.create_geosphere(2.0, tess)  # radius 1
    return trimesh.make_mesh(pos, nrm, uv, idx)


def test_single_triangle():
    mesh = trimesh.make_mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.array([[0, 0, -1]] * 3, np.float32),
        uvs=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32))
    o = jnp.array([[0.25, 0.25, -2.0], [0.9, 0.9, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, face, u, v = trimesh.intersect_mesh(o, d, jnp.zeros(2),
                                           jnp.full((2,), 1e9), mesh)
    assert np.isfinite(float(t[0])) and float(t[0]) == 2.0
    assert not np.isfinite(float(t[1]))  # outside the triangle
    np.testing.assert_allclose([float(u[0]), float(v[0])], [0.25, 0.25],
                               atol=1e-5)


def test_geosphere_matches_analytic_sphere():
    """Triangle geosphere hits must match the analytic sphere within the
    tessellation error."""
    mesh = _unit_geosphere(4)
    rng = np.random.RandomState(0)
    n = 500
    o = jnp.asarray(rng.randn(n, 3), jnp.float32) * 0.5 \
        + jnp.array([0.0, 0.0, -5.0])
    d = m.normalize(jnp.array([[0.0, 0.0, 1.0]]) * jnp.ones((n, 1))
                    + 0.1 * jnp.asarray(rng.randn(n, 3), jnp.float32))
    t_tri, face, u, v = trimesh.intersect_mesh(o, d, jnp.zeros(n),
                                               jnp.full((n,), 1e9), mesh)
    sph = intersect.intersect_spheres(o, d, jnp.zeros(n),
                                      jnp.full((n,), 1e9),
                                      jnp.zeros((1, 3)), jnp.ones(1))
    hit_tri = np.isfinite(np.asarray(t_tri))
    hit_sph = np.asarray(sph.hit)
    # Same hit classification away from silhouettes (>97%).
    assert (hit_tri == hit_sph).mean() > 0.97
    both = hit_tri & hit_sph
    # Tessellation chord error grows at grazing incidence; 2% covers it.
    np.testing.assert_allclose(np.asarray(t_tri)[both],
                               np.asarray(sph.t)[both], rtol=0.02)


def test_instanced_meshes_and_attributes():
    mesh = _unit_geosphere(3)
    pos = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    rot = jnp.tile(m.QUAT_IDENTITY, (2, 1))
    scale = jnp.array([1.0, 0.5])
    o = jnp.array([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = trimesh.intersect_instances(o, d, jnp.zeros(2),
                                      jnp.full((2,), 1e9), mesh, pos, rot,
                                      scale)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    assert int(hit.instance[0]) == 0 and int(hit.instance[1]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=0.05)
    np.testing.assert_allclose(float(hit.t[1]), 4.5, atol=0.05)
    normal, uv, tangent = trimesh.interpolate_attributes(mesh, hit, rot)
    np.testing.assert_allclose(np.asarray(normal[0]), [0, 0, -1], atol=0.05)
    assert abs(float(m.dot(normal[0], tangent[0]))) < 0.1
    assert 0.0 <= float(uv[0, 0]) <= 1.0


def test_pallas_mesh_kernel_matches_xla():
    """Interpret-mode equivalence of the Pallas instanced-mesh kernel
    (ops/trimesh_pallas.py) against the XLA instance sweep — random rays
    against rotated/scaled geosphere instances (round-3 VERDICT #6)."""
    rng = np.random.RandomState(3)
    mesh = _unit_geosphere(3)
    k = 5
    pos = jnp.asarray(rng.randn(k, 3) * 4, jnp.float32)
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    scale = jnp.asarray(0.5 + rng.rand(k) * 1.5, jnp.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 8, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)

    ref = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos, rot,
                                      scale)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        pal = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos, rot,
                                          scale)
    finally:
        intersect.BACKEND = old

    hit_r = np.asarray(ref.hit)
    hit_p = np.asarray(pal.hit)
    # Hit classification must agree except for degenerate grazing lanes.
    assert (hit_r == hit_p).mean() > 0.999
    both = hit_r & hit_p
    t_r = np.asarray(ref.t)[both]
    t_p = np.asarray(pal.t)[both]
    # Exact t is Newton/MT-refined; near-tie faces (shared edges) may
    # resolve to either side, so compare distances, not face ids.
    np.testing.assert_allclose(t_p, t_r, rtol=1e-3, atol=1e-4)
    same_face = (np.asarray(ref.face)[both] == np.asarray(pal.face)[both])
    same_inst = (np.asarray(ref.instance)[both]
                 == np.asarray(pal.instance)[both])
    assert (same_face & same_inst).mean() > 0.98
    # Barycentrics of same-face winners agree.
    sf = np.zeros_like(hit_r)
    sf[both] = same_face & same_inst
    np.testing.assert_allclose(np.asarray(pal.barycentrics)[sf],
                               np.asarray(ref.barycentrics)[sf],
                               atol=2e-3)


def test_pallas_mesh_kernel_many_instances():
    """Multi-chunk TLAS: 48 instances span several INST_CHUNK groups, so
    the kernel's instance-chunk scalar cull, the near-to-far chunk
    reorder, and the sorted-position -> instance-id mapping all engage.
    Must agree with the XLA sweep like the small case."""
    rng = np.random.RandomState(11)
    mesh = _unit_geosphere(2)
    k = 48
    pos = jnp.asarray(rng.randn(k, 3) * 10, jnp.float32)
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    scale = jnp.asarray(0.4 + rng.rand(k) * 1.2, jnp.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 12, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)

    ref = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos, rot,
                                      scale)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        pal = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos, rot,
                                          scale)
    finally:
        intersect.BACKEND = old

    hit_r = np.asarray(ref.hit)
    hit_p = np.asarray(pal.hit)
    assert (hit_r == hit_p).mean() > 0.999
    both = hit_r & hit_p
    np.testing.assert_allclose(np.asarray(pal.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-3,
                               atol=1e-4)
    same = (np.asarray(ref.instance)[both] == np.asarray(pal.instance)[both])
    assert same.mean() > 0.98


def test_pallas_mesh_anyhit_matches_closest_hit():
    """The any-hit mesh kernel (shadow rays) must classify occlusion
    exactly like the closest-hit sweep's hit bit — including range-bounded
    rays (finite tmax) and dead lanes (tmax < tmin)."""
    rng = np.random.RandomState(23)
    mesh = _unit_geosphere(2)
    k = 24
    pos = jnp.asarray(rng.randn(k, 3) * 8, jnp.float32)
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    scale = jnp.asarray(0.5 + rng.rand(k), jnp.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 10, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    # Mix of unbounded, short, and dead rays.
    tmax = jnp.asarray(np.where(rng.rand(n) < 0.3, 1e9,
                                np.where(rng.rand(n) < 0.5,
                                         rng.rand(n) * 12, -1.0)),
                       jnp.float32)

    ref = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos, rot,
                                      scale)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        occ = trimesh.intersect_instances_any(o, d, tmin, tmax, mesh, pos,
                                              rot, scale)
    finally:
        intersect.BACKEND = old
    occ = np.asarray(occ)
    hit_r = np.asarray(ref.hit)
    assert (occ == hit_r).mean() > 0.999, (occ != hit_r).sum()
    assert not occ[np.asarray(tmax) < 0].any()


def test_as_mesh_scene_renders():
    """The demo scene converted to 100% instanced triangle meshes
    (myscene.as_mesh_scene — the reference's actual geosphere BLAS
    workload) renders finite radiance that tracks the sphere-scene render
    (chord error aside)."""
    import jax.numpy as jnp
    from drts_tpu.models import myscene
    from drts_tpu.ops import camera as camera_mod, pathtrace

    host = myscene.build(oscillator_grid=2)
    mh = myscene.as_mesh_scene(host, tessellation=2)
    assert mh.scene.center.shape[0] == 0
    assert mh.scene.mesh_instances.center.shape[0] == host.scene.center.shape[0]
    cam = camera_mod.make_camera(mh.camera_position, mh.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=48, height=48, bounces=2,
                                    samples_per_pixel=1, block_size=2304)
    out = pathtrace.trace_image(mh.scene, cam, cfg, 0)
    r = np.asarray(out.radiance)
    assert np.isfinite(r).all()
    out_s = pathtrace.trace_image(host.scene, cam, cfg, 0)
    rs = np.asarray(out_s.radiance)
    # Same scene, tessellated: hit maps agree away from silhouettes and
    # mean radiance is in the same ballpark.
    agree = (np.asarray(out.primary_valid)
             == np.asarray(out_s.primary_valid)).mean()
    assert agree > 0.85
    assert abs(r.mean() - rs.mean()) / max(rs.mean(), 1e-6) < 0.25


def _cand_vs_serial_scene(seed, k=24, n=4096, ground=True):
    """Random instanced scene exercising the candidate-iteration path's
    hard cases: a huge ground-like instance whose bound contains most ray
    origins (clamped-entry ties), overlapping bounds, and rays spawned on
    instance surfaces (secondary-bounce geometry)."""
    rng = np.random.RandomState(seed)
    mesh = _unit_geosphere(3)
    pos = rng.randn(k, 3).astype(np.float32) * 6
    scale = (0.4 + rng.rand(k) * 1.4).astype(np.float32)
    if ground:
        pos[0] = [0.0, -100.0, 0.0]
        scale[0] = 99.0  # bound contains every origin below
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    o = rng.randn(n, 3).astype(np.float32) * 8
    # Half the rays start ON a random instance surface (inside its bound).
    half = n // 2
    which = rng.randint(0, k, half)
    dir_out = rng.randn(half, 3)
    dir_out /= np.linalg.norm(dir_out, axis=1, keepdims=True)
    o[:half] = pos[which] + dir_out * scale[which][:, None] * 1.001
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    return (mesh, jnp.asarray(pos), rot, jnp.asarray(scale),
            jnp.asarray(o), d)


def _run_cand_vs_serial(monkeypatch, iters):
    mesh, pos, rot, scale, o, d = _cand_vs_serial_scene(7)
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        monkeypatch.setattr(trimesh, "MESH_CAND", False)
        serial = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos,
                                             rot, scale)
        monkeypatch.setattr(trimesh, "MESH_CAND", True)
        monkeypatch.setattr(trimesh, "MESH_CAND_ITERS", iters)
        cand = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos,
                                           rot, scale)
    finally:
        intersect.BACKEND = old
    hit_s = np.asarray(serial.hit)
    hit_c = np.asarray(cand.hit)
    assert (hit_s == hit_c).mean() > 0.999, (hit_s != hit_c).sum()
    both = hit_s & hit_c
    np.testing.assert_allclose(np.asarray(cand.t)[both],
                               np.asarray(serial.t)[both], rtol=1e-3,
                               atol=1e-4)
    same = (np.asarray(serial.instance)[both]
            == np.asarray(cand.instance)[both])
    assert same.mean() > 0.99, same.mean()


def test_candidate_path_matches_serial(monkeypatch):
    """Candidate-iteration closest hit (bound_scan + shared-BLAS sweeps,
    trimesh_pallas.intersect_mesh_instances_cand) must match the serial
    instanced kernel on a scene with a ground-like giant bound,
    overlapping bounds, and surface-spawned rays."""
    _run_cand_vs_serial(monkeypatch, 6)


def test_candidate_path_backstop(monkeypatch):
    """iters=1 forces most enumeration through the exact backstop kernel:
    the merge of candidate-phase and backstop results must stay correct."""
    _run_cand_vs_serial(monkeypatch, 1)


def test_candidate_anyhit_matches_serial(monkeypatch):
    """Candidate-iteration any-hit must classify occlusion exactly like
    the serial any-hit kernel, including range-bounded shadow segments
    and lanes starting inside the ground-like giant bound."""
    rng = np.random.RandomState(13)
    mesh, pos, rot, scale, o, d = _cand_vs_serial_scene(13)
    n = o.shape[0]
    tmin = jnp.zeros(n)
    # Mixed ranges: some unbounded, some short (unoccluded), some dead.
    tmax = jnp.asarray(np.where(rng.rand(n) < 0.2, 0.5,
                                np.where(rng.rand(n) < 0.1, -1.0, 1e9)),
                       jnp.float32)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        monkeypatch.setattr(trimesh, "MESH_CAND", False)
        occ_s = np.asarray(trimesh.intersect_instances_any(
            o, d, tmin, tmax, mesh, pos, rot, scale))
        monkeypatch.setattr(trimesh, "MESH_CAND", True)
        monkeypatch.setattr(trimesh, "MESH_CAND_ITERS", 4)
        occ_c = np.asarray(trimesh.intersect_instances_any(
            o, d, tmin, tmax, mesh, pos, rot, scale))
    finally:
        intersect.BACKEND = old
    assert (occ_s == occ_c).mean() > 0.999, (occ_s != occ_c).sum()
    assert not occ_c[np.asarray(tmax) < 0].any()


def test_per_vertex_motion_vectors():
    """Deforming-mesh motion vectors (GBufferGeneration.hlsl:62-91
    vertex-motion path): a mesh whose vertices all carry a constant
    object-space prev-minus-current displacement must produce G-buffer
    motion equal to the projected displacement; without vertex_motion
    (rigid) the static scene's motion is zero."""
    import dataclasses
    import jax.numpy as jnp
    from drts_tpu.models import geometry, scene as scene_mod, myscene
    from drts_tpu.ops import camera as camera_mod, gbuffer

    host = myscene.build(oscillator_grid=2)
    base = myscene.as_mesh_scene(host, tessellation=2)

    w = h = 64
    cam = camera_mod.make_camera(base.camera_position, base.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=1.0)

    # Rigid static scene: prev pose == pose, no vertex motion -> zero MVs.
    g0 = gbuffer.generate(base.scene, cam, w, h, 4096)
    valid0 = np.asarray(g0.surf.valid)
    assert valid0.any()
    np.testing.assert_allclose(np.asarray(g0.motion)[valid0], 0.0,
                               atol=1e-2)

    # Same mesh with constant object-space vertex motion d: expected
    # previous world position = hit + R*(d*scale); motion = prev_px-cur_px.
    d_obj = np.array([0.12, -0.07, 0.05], np.float32)
    mesh = base.scene.mesh
    vm = np.tile(d_obj, (np.asarray(mesh.positions).shape[0], 1))
    mesh_vm = dataclasses.replace(mesh, vertex_motion=jnp.asarray(vm))
    scene_vm = dataclasses.replace(base.scene, mesh=mesh_vm)
    g1 = gbuffer.generate(scene_vm, cam, w, h, 4096)
    valid1 = np.asarray(g1.surf.valid)
    np.testing.assert_array_equal(valid0, valid1)

    from drts_tpu.utils import math as m
    mi = base.scene.mesh_instances
    k = base.scene.center.shape[0]
    inst = jnp.asarray(np.asarray(g1.surf.object_index) - k)
    rot = mi.rotation[inst]
    scale = mi.scale[inst][..., None]
    prev_world = g1.surf.position + m.quat_rotate(
        rot, jnp.broadcast_to(jnp.asarray(d_obj), g1.surf.position.shape)
        * scale)
    prev_ndc, _ = camera_mod.project_to_ndc(cam, prev_world, previous=True)
    cur_ndc, _ = camera_mod.project_to_ndc(cam, g1.surf.position,
                                           previous=False)
    exp = np.asarray(camera_mod.ndc_to_pixel(prev_ndc, w, h)
                     - camera_mod.ndc_to_pixel(cur_ndc, w, h))
    got = np.asarray(g1.motion)
    np.testing.assert_allclose(got[valid1], exp[valid1], atol=2e-2)
    # And it actually moved (non-zero motion somewhere).
    assert np.abs(got[valid1]).max() > 0.05


def test_candidate_fused_matches_serial(monkeypatch):
    """Fused single-launch candidate kernel (DRTS_MESH_CAND=2,
    trimesh_pallas.cand_fused) must match the serial kernel like the
    multi-launch form does."""
    mesh, pos, rot, scale, o, d = _cand_vs_serial_scene(7)
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        monkeypatch.setattr(trimesh, "MESH_CAND", 0)
        serial = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos,
                                             rot, scale)
        monkeypatch.setattr(trimesh, "MESH_CAND", 2)
        monkeypatch.setattr(trimesh, "MESH_CAND_ITERS", 5)
        fused = trimesh.intersect_instances(o, d, tmin, tmax, mesh, pos,
                                            rot, scale)
    finally:
        intersect.BACKEND = old
    hit_s = np.asarray(serial.hit)
    hit_f = np.asarray(fused.hit)
    assert (hit_s == hit_f).mean() > 0.999, (hit_s != hit_f).sum()
    both = hit_s & hit_f
    np.testing.assert_allclose(np.asarray(fused.t)[both],
                               np.asarray(serial.t)[both], rtol=1e-3,
                               atol=1e-4)
    same = (np.asarray(serial.instance)[both]
            == np.asarray(fused.instance)[both])
    assert same.mean() > 0.99, same.mean()


def test_convexity_detection_and_cone_tables():
    """build_mesh_tables must flag the geosphere convex with outward
    per-chunk normal cones, and refuse convexity for a non-convex mesh
    (two disjoint triangles cannot pass the closed-manifold plane test)."""
    from drts_tpu.ops import trimesh_pallas as tp

    mesh = _unit_geosphere(3)
    assert mesh.convex
    assert abs(mesh.local_radius - 1.0) < 1e-3
    b = np.asarray(mesh.tri_bounds)
    assert b.shape[0] == 8
    for c in range(mesh.n_chunks):
        an = b[4:7, c]
        ln = np.linalg.norm(an)
        assert abs(ln - 1.0) < 1e-4          # unit cone axis
        # Outward: axis points away from the origin-centered sphere, i.e.
        # roughly along the chunk centroid direction.
        ctr = b[0:3, c]
        assert float(an @ (ctr / (np.linalg.norm(ctr) + 1e-9))) > 0.3
        assert -1.0 <= b[7, c] <= 1.0

    # Non-convex: a saddle-ish open sheet (not a closed manifold either).
    v0 = np.array([[0, 0, 0], [2, 0, 0]], np.float32)
    e1 = np.array([[1, 0, 0], [1, 0, 0]], np.float32)
    e2 = np.array([[0, 1, 0], [0, 1, 1]], np.float32)
    *_, convex = tp.build_mesh_tables(v0, e1, e2)
    assert not convex


def test_convex_cull_interior_rays_match_reference(monkeypatch):
    """Transmission-style rays with origins INSIDE a geosphere instance
    must keep the full chunk sweep (the |o_local| > R guard): back-face
    exits are their closest hits, and the convexity cull must not change
    them. Compares the Pallas candidate path (cull ON) against the
    portable XLA sweep."""
    mesh = _unit_geosphere(3)
    assert mesh.convex
    rng = np.random.RandomState(3)
    k = 6
    pos = rng.randn(k, 3).astype(np.float32) * 5
    scale = (0.8 + rng.rand(k)).astype(np.float32)
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    n = 256
    which = rng.randint(0, k, n)
    # Origins strictly inside their instance (|o_local| ~ 0.5 R).
    off = rng.randn(n, 3)
    off /= np.linalg.norm(off, axis=1, keepdims=True)
    o = pos[which] + off * (0.5 * scale[which][:, None])
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    o = jnp.asarray(o)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e9)

    old = intersect.BACKEND
    intersect.BACKEND = "xla"
    try:
        ref = trimesh.intersect_instances(o, d, tmin, tmax, mesh,
                                          jnp.asarray(pos), rot,
                                          jnp.asarray(scale))
    finally:
        intersect.BACKEND = old
    intersect.BACKEND = "interpret"
    try:
        monkeypatch.setattr(trimesh, "MESH_CAND", True)
        got = trimesh.intersect_instances(o, d, tmin, tmax, mesh,
                                          jnp.asarray(pos), rot,
                                          jnp.asarray(scale))
    finally:
        intersect.BACKEND = old
    hit_r = np.asarray(ref.hit)
    hit_g = np.asarray(got.hit)
    # Interior origins always exit through the instance: every ray hits.
    assert hit_r.all()
    assert (hit_r == hit_g).mean() > 0.995, (hit_r != hit_g).sum()
    both = hit_r & hit_g
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-3,
                               atol=1e-4)
