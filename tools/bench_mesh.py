"""Mesh-mode trace benchmark: the 448-instance geosphere demo scene
rendered as REAL triangle meshes through the Pallas instanced-mesh kernel
(ops/trimesh_pallas.py) — the reference's actual BLAS/TLAS workload
(Scene.ixx:225-284). Prints Mray/s at 1080p for a given tessellation.

Usage: python tools/bench_mesh.py [tessellation=4] [bounces=2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from drts_tpu.models import myscene
from drts_tpu.ops import camera as camera_mod, pathtrace


def main(tess: int = 4, bounces: int = 2, width: int = 1920,
         height: int = 1080, compact_from: int = 2):
    host = myscene.build(oscillator_grid=10)
    mh = myscene.as_mesh_scene(host, tessellation=tess)
    scene = mh.scene
    print(f"instances: {scene.mesh_instances.center.shape[0]}, "
          f"faces: {scene.mesh.v0.shape[0]}", flush=True)
    cam = camera_mod.make_camera(mh.camera_position, mh.camera_forward,
                                 horizontal_fov_deg=90.0,
                                 aspect=width / height)
    cfg = pathtrace.PathTraceConfig(width=width, height=height,
                                    bounces=bounces, samples_per_pixel=1,
                                    block_size=32768,
                                    compact_from=compact_from)

    @jax.jit
    def frame(scene, cam, fi):
        out = pathtrace.trace_image(scene, cam, cfg, fi)
        return out.radiance, out.rays_traced

    rad, rays = frame(scene, cam, 0)
    jax.block_until_ready(rad)
    r = np.asarray(rad)
    assert np.isfinite(r).all(), "NaN radiance"
    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        rad, rays = frame(scene, cam, i + 1)
    jax.block_until_ready(rad)
    ms = (time.perf_counter() - t0) / iters * 1e3
    mray = float(rays) / 1e6 / (ms / 1e3)
    print(f"mesh trace tess={tess} bounces={bounces} "
          f"cfrom={compact_from}: "
          f"{ms:.1f} ms, {float(rays)/1e6:.2f} Mray -> {mray:.2f} Mray/s",
          flush=True)


if __name__ == "__main__":
    tess = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfrom = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    main(tess, bounces, compact_from=cfrom)
