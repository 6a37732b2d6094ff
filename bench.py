"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/sec/chip on the Cornell Box at 1080p, 1 SPP,
8-bounce default config. Baseline north star: 500 Mrays/sec/chip on v5e.
Ray count is the *actual* number of closest-hit queries issued by live path
lanes (counted inside the integrator), not pool-size x bounces.
"""

import json
import os
import sys
import time

# Persistent compilation cache: axon-tunnel compiles are slow (the 1080p
# frame graph can take minutes cold); cache them across bench processes.
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "jax_comp")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def _ensure_cache():
    """Make the compilation cache robust to import order: if another module
    imported jax before us, the env vars above were inert — set the config
    directly (advisor round-3 finding)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without these config names


def bench_app(width=1920, height=1080, quiet=False, scale=None,
              regir=None, sharc_log2=None):
    """The flagship BASELINE metric: 1080p FPS at 1 SPP with the FULL frame
    graph — ReSTIR DI + SHARC + denoise + TAA + bloom + tonemap
    (reference golden config: README.md:59-64; metric def: BASELINE.json).
    `scale` overrides super_resolution_scale (1.0 = native-res DLAA
    analogue, the reference's golden config; default = settings default).
    Returns (fps, mrays_per_sec, rays_per_frame)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    s = GraphicsSettings()
    s.width, s.height = width, height
    if scale is not None:
        s.post_processing.super_resolution_scale = scale
    # A/B toggles for defaults-regression hunts (env for queue scripts)
    regir = (os.environ.get("BENCH_REGIR", "") or None) if regir is None \
        else regir
    if regir is not None:
        s.raytracing.regir = bool(int(regir))
    sharc_log2 = (os.environ.get("BENCH_SHARC_LOG2", "") or None) \
        if sharc_log2 is None else sharc_log2
    if sharc_log2 is not None:
        s.raytracing.sharc_capacity_log2 = int(sharc_log2)
    s.raytracing.compaction_schedule = tuple(
        int(x) for x in os.environ.get("BENCH_FOLD", "4,5,6").split(",") if x)
    s.check()
    scene = make_cornell_box()
    cam = make_cornell_camera(width, height)
    app = App(scene, cam, s)
    cam_data = cam.data()
    hist0 = app.history

    def frames(n):
        def run(c, hist):
            def body(i, carry):
                acc, rays, h = carry
                img, rc, h = app._frame(app.tracer, scene, c,
                                        i.astype(jnp.uint32), h)
                return acc + img[::64, ::64].sum(), rays + rc, h
            return lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros(()), hist))
        return jax.jit(run)

    f_lo, f_hi = frames(1), frames(4)
    float(f_lo(cam_data, hist0)[0])
    float(f_hi(cam_data, hist0)[0])

    def best_time(f):
        best, rays = float("inf"), 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            _, r, _ = f(cam_data, hist0)
            rays = float(r)
            best = min(best, time.perf_counter() - t0)
        return best, rays

    t_lo, rays_lo = best_time(f_lo)
    t_hi, rays_hi = best_time(f_hi)
    per_frame = (t_hi - t_lo) / 3
    rays_per_frame = (rays_hi - rays_lo) / 3
    return (1.0 / per_frame, rays_per_frame / per_frame / 1e6,
            rays_per_frame)


def _animated_setup(width=1920, height=1080):
    """Shared setup for the animated bench/breakdown: a 5k-tri skinned
    tube (blocked backend) and a one-frame function with in-jit palettes
    (a two-joint bend driven by the frame index).
    Returns (frame_fn(cam, i) -> (img, rays))."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_pbrt.models.cornell import make_cornell_camera
    from tpu_pbrt.models.material import make_table
    from tpu_pbrt.models.mesh import build_geometry
    from tpu_pbrt.models.scene import make_environment, make_scene
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.animated import _animated_frame
    from tpu_pbrt.ops import tracer as tracer_mod

    # skinned tube: 64 x 40 segments = 5120 tris (blocked tracer scale)
    nu, nv = 64, 41
    ang = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    ys = np.linspace(0.0, 3.0, nv)
    aa, yy = np.meshgrid(ang, ys, indexing="ij")
    pos = np.stack([np.cos(aa) * 0.5, yy, np.sin(aa) * 0.5 - 2.78],
                   -1).reshape(-1, 3).astype(np.float32)
    nrm = np.stack([np.cos(aa), np.zeros_like(aa), np.sin(aa)],
                   -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(nu):
        for j in range(nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    indices = np.asarray(idx, np.int32)
    geom = build_geometry([{
        "positions": pos, "normals": nrm, "indices": indices, "material": 0,
    }])
    scene = make_scene(geom, make_table([{
        "base_color": (0.7, 0.5, 0.3, 1.0), "roughness": 0.4,
    }]), make_environment())
    trc = tracer_mod.build_for_scene(scene)
    assert trc.kind in ("blocked", "culled"), trc.kind  # FORCE_TRACER A/B

    # two joints: root (identity) + bend joint weighted by height
    wmat = np.zeros((pos.shape[0], 2), np.float32)
    wmat[:, 1] = np.clip(pos[:, 1] / 3.0, 0.0, 1.0)
    wmat[:, 0] = 1.0 - wmat[:, 1]

    settings = PathTraceSettings(bounces=4, samples_per_pixel=1,
                                 count_rays=True)
    i0 = jnp.asarray(indices[:, 0])
    i1 = jnp.asarray(indices[:, 1])
    i2 = jnp.asarray(indices[:, 2])
    wj = jnp.asarray(wmat)
    posj = jnp.asarray(pos)
    nrmj = jnp.asarray(nrm)
    tanj = jnp.zeros((pos.shape[0], 4))

    def palette(frame):
        """(2, 12) row-major 3x4: identity root + Z-rotation bend."""
        th = 0.6 * jnp.sin(frame.astype(jnp.float32) * 0.2)
        c, s = jnp.cos(th), jnp.sin(th)
        z = jnp.zeros(())
        one = jnp.ones(())
        root = jnp.stack([one, z, z, z, z, one, z, z, z, z, one, z])
        bend = jnp.stack([c, -s, z, z, s, c, z, z, z, z, one, z])
        return jnp.stack([root, bend])

    def frame_fn(c, i):
        f = i.astype(jnp.uint32)
        img, rc, _ = _animated_frame(
            trc, scene, c, f, palette(i), palette(i - 1),
            wj, posj, nrmj, tanj, i0, i1, i2,
            width=width, height=height, settings=settings)
        return img, rc

    cam = make_cornell_camera(width, height).data()
    return frame_fn, cam


def bench_animated(width=1920, height=1080):
    """BASELINE config #4: per-frame skinning + accel refit + render for a
    5k-tri skinned tube (blocked backend). Palettes computed in-jit so
    frames batch in one fori.
    Returns (fps, mrays_per_sec, rays_per_frame)."""
    import jax
    from jax import lax

    frame_fn, cam = _animated_setup(width, height)

    def frames(n):
        def run(c):
            def body(i, carry):
                acc, rays = carry
                img, rc = frame_fn(c, i)
                return acc + img[::64, ::64].sum(), rays + rc
            return lax.fori_loop(0, n, body, (0.0, 0.0))
        return jax.jit(run)

    f_lo, f_hi = frames(1), frames(4)
    float(f_lo(cam)[0]); float(f_hi(cam)[0])
    best = float("inf")
    rays_lo = rays_hi = 0.0
    t_lo = t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _, r = f_lo(cam); rays_lo = float(r)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); _, r = f_hi(cam); rays_hi = float(r)
        t_hi = min(t_hi, time.perf_counter() - t0)
    per_frame = (t_hi - t_lo) / 3
    rpf = (rays_hi - rays_lo) / 3
    return 1.0 / per_frame, rpf / per_frame / 1e6, rpf


def bench_manylight(width=1920, height=1080):
    """BASELINE config #5: many-light interior (64 emitters) through the
    FULL frame graph with ReGIR presampling + ReSTIR DI + SHARC at 1 SPP.
    Returns (fps, mrays_per_sec, rays_per_frame)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_pbrt.models.manylight import make_many_light_room
    from tpu_pbrt.render.app import App
    from tpu_pbrt.render.camera import Camera
    from tpu_pbrt.utils.config import GraphicsSettings

    s = GraphicsSettings()
    s.width, s.height = width, height
    s.raytracing.compaction_schedule = (4, 5, 6)
    s.raytracing.regir = True
    s.raytracing.regir_cell_size = 1.5
    s.check()
    scene = make_many_light_room(n_side=8)
    cam = Camera(position=np.asarray([0.0, 3.0, 9.0], np.float32))
    cam.look(180.0, 15.0)
    app = App(scene, cam, s)
    cam_data = cam.data()
    hist0 = app.history

    def frames(n):
        def run(c, hist):
            def body(i, carry):
                acc, rays, h = carry
                img, rc, h = app._frame(app.tracer, scene, c,
                                        i.astype(jnp.uint32), h)
                return acc + img[::64, ::64].sum(), rays + rc, h
            return lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros(()), hist))
        return jax.jit(run)

    f_lo, f_hi = frames(1), frames(4)
    float(f_lo(cam_data, hist0)[0]); float(f_hi(cam_data, hist0)[0])
    t_lo = t_hi = float("inf")
    rays_lo = rays_hi = 0.0
    for _ in range(3):
        t0 = time.perf_counter(); _, r, _ = f_lo(cam_data, hist0)
        rays_lo = float(r); t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); _, r, _ = f_hi(cam_data, hist0)
        rays_hi = float(r); t_hi = min(t_hi, time.perf_counter() - t0)
    per_frame = (t_hi - t_lo) / 3
    rpf = (rays_hi - rays_lo) / 3
    return 1.0 / per_frame, rpf / per_frame / 1e6, rpf


def _write_sphere_glb(path: str, textured: bool, shape: str = "sphere",
                      nu: int = 160, nv: int = 80):
    """Author the BASELINE #3 bench asset as a REAL .glb (25k-tri mesh,
    PBR material, embedded 256^2 checker base-color PNG when textured) so
    the bench exercises the production glTF pipeline (models/gltf.py),
    matching the reference's glTF-loaded mesh config.

    shape="sphere": the round-2 UV sphere (kept for measurement
    continuity). shape="helmet": a Damaged-Helmet-class hard-surface mesh
    — the reference's BASELINE #3 asset is not shipped and there is no
    network, so the helmet is AUTHORED: open bottom, smoothed visor
    indentation, brim flare, crown vent ridges and asymmetric surface
    detail over the same 160x80 grid. Unlike the perfect sphere it has
    concave regions, a boundary edge and non-uniform triangle density —
    the traversal/shading workload class of a real scanned asset."""
    import io
    import json as _json
    import struct as _struct

    import numpy as _np

    theta_max = _np.pi if shape == "sphere" else 0.82 * _np.pi
    theta = _np.linspace(0, theta_max, nv)
    phi = _np.linspace(0, 2 * _np.pi, nu, endpoint=False)
    tt, pp = _np.meshgrid(theta, phi, indexing="ij")
    unit = _np.stack([_np.sin(tt) * _np.cos(pp), _np.cos(tt),
                      _np.sin(tt) * _np.sin(pp)], -1)
    if shape == "sphere":
        r = _np.ones_like(tt)
    else:
        def _smooth(x):
            x = _np.clip(x, 0.0, 1.0)
            return x * x * (3.0 - 2.0 * x)

        t = tt / theta_max
        dphi = _np.angle(_np.exp(1j * (pp - _np.pi / 2)))  # wrap to ±π
        r = _np.ones_like(tt)
        # visor: smoothed frontal indentation
        r -= 0.12 * (_smooth((t - 0.30) / 0.12) * _smooth((0.68 - t) / 0.12)
                     * _smooth((0.85 - _np.abs(dphi)) / 0.35))
        # brim flare at the open bottom
        r += 0.08 * _smooth((t - 0.86) / 0.12)
        # crown vent ridges
        r += 0.012 * _np.cos(14.0 * pp) * _smooth((0.30 - t) / 0.18)
        # asymmetric organic detail (scanned-surface stand-in)
        r += 0.008 * _np.sin(5.0 * tt) * _np.cos(3.0 * pp + 1.7)
    pos = (r[..., None] * unit).reshape(-1, 3)
    idx = []
    for i in range(nv - 1):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            e = (i + 1) * nu + (j + 1) % nu
            idx += [[a, b, c], [b, e, c]]
    idx = _np.asarray(idx, _np.uint32).reshape(-1)
    # equirect UVs so the base-color texture wraps the mesh
    uvs = _np.stack([pp.reshape(-1) / (2 * _np.pi),
                     tt.reshape(-1) / _np.pi], -1).astype(_np.float32)
    pos = pos.astype(_np.float32)

    if shape == "sphere":
        normals = pos
    else:
        # area-weighted smooth vertex normals (the surface is no longer
        # a unit sphere, so position != normal)
        tri = idx.reshape(-1, 3)
        fn = _np.cross(pos[tri[:, 1]] - pos[tri[:, 0]],
                       pos[tri[:, 2]] - pos[tri[:, 0]])
        normals = _np.zeros_like(pos)
        for k in range(3):
            _np.add.at(normals, tri[:, k], fn)
        nl = _np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = (normals / _np.maximum(nl, 1e-12)).astype(_np.float32)

    parts = [pos.tobytes(), normals.tobytes(), uvs.tobytes(), idx.tobytes()]
    if textured:
        from PIL import Image

        yy, xx = _np.meshgrid(_np.arange(256), _np.arange(256),
                              indexing="ij")
        checker = ((xx // 16 + yy // 16) % 2).astype(_np.uint8) * 180 + 60
        tex = _np.stack([checker, checker, checker,
                         _np.full_like(checker, 255)], -1)
        bio = io.BytesIO()
        Image.fromarray(tex).save(bio, "PNG")
        parts.append(bio.getvalue())

    views, offset = [], 0
    for p in parts:
        views.append({"buffer": 0, "byteOffset": offset,
                      "byteLength": len(p)})
        offset += len(p)
        pad = (-offset) % 4
        offset += pad
        p_i = len(views) - 1
        parts[p_i] = p + b"\x00" * pad
    blob = b"".join(parts)

    n_v = pos.shape[0]
    material = {"pbrMetallicRoughness": {
        "baseColorFactor": [0.9, 0.8, 0.7, 1.0],
        "metallicFactor": 0.8, "roughnessFactor": 0.4}}
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [material],
        "bufferViews": views,
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": n_v,
             "type": "VEC3", "min": pos.min(0).tolist(),
             "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": n_v,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": n_v,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5125,
             "count": int(idx.shape[0]), "type": "SCALAR"},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if textured:
        material["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
        doc["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
        doc["textures"] = [{"source": 0}]

    js = _json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    with open(path, "wb") as f:
        f.write(_struct.pack("<III", 0x46546C67, 2, total))
        f.write(_struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(_struct.pack("<II", len(blob), 0x004E4942))
        f.write(blob)


def _sphere_setup(textured: bool, height: int = 1080,
                  shape: str = "sphere", nu: int = 160, nv: int = 80):
    """25k-tri glTF mesh scene for BASELINE config #3 benches: authors
    a real .glb (sphere or helmet-class hard-surface mesh — see
    _write_sphere_glb) and loads it through the production glTF path.
    Returns (scene, settings, textures, texture_srgb)."""
    import numpy as _np

    from tpu_pbrt.models import gltf
    from tpu_pbrt.models.material import make_table
    from tpu_pbrt.models.mesh import build_geometry
    from tpu_pbrt.models.scene import make_environment, make_scene
    from tpu_pbrt.passes.pathtrace import PathTraceSettings

    glb = f"/tmp/tpu_pbrt_bench_{shape}_{nu}x{nv}_{int(textured)}.glb"
    _write_sphere_glb(glb, textured, shape, nu=nu, nv=nv)
    model = gltf.load(glb)
    geometry = build_geometry(gltf.to_geometry_meshes(model))
    mats = make_table(model.materials)
    textures = model.textures if textured else None
    tex_srgb = model.texture_srgb if textured else None
    scene = make_scene(geometry, mats, make_environment(),
                       textures=textures, texture_srgb=tex_srgb)
    # ~95% of primary rays miss the distant sphere, so the live pool
    # collapses after bounce 0: fold at every bounce (unbiased,
    # tests/test_compaction.py)
    settings = PathTraceSettings(
        bounces=4, samples_per_pixel=1, count_rays=True,
        compaction_schedule=(1, 2, 3),
        cone_spread=(2.0 * float(_np.tan(_np.radians(45.0) / 2)) / height
                     if textured else 0.0))
    return scene, settings, textures, tex_srgb


def breakdown(config: str = "cornell"):
    """Per-pass wall-time breakdown via jax.profiler: runs the config once
    under a trace and aggregates device-op durations by named_scope prefix
    (the PIX-capture analogue, SURVEY.md §5). Prints a table to stderr and
    a JSON dict to stdout."""
    import glob
    import gzip
    from collections import defaultdict

    import jax
    import jax.numpy as jnp
    from jax import lax

    tracedir = "/tmp/tpu_pbrt_profile"
    os.system(f"rm -rf {tracedir}")

    if config in ("app", "manylight"):
        from tpu_pbrt.models.cornell import (make_cornell_box,
                                             make_cornell_camera)
        from tpu_pbrt.render.app import App
        from tpu_pbrt.utils.config import GraphicsSettings

        s = GraphicsSettings()
        s.raytracing.compaction_schedule = (4, 5, 6)
        if config == "manylight":
            import numpy as _np

            from tpu_pbrt.models.manylight import make_many_light_room
            from tpu_pbrt.render.camera import Camera

            s.raytracing.regir = True
            s.raytracing.regir_cell_size = 1.5
            s.check()
            scene = make_many_light_room(n_side=8)
            cam = Camera(position=_np.asarray([0.0, 3.0, 9.0], _np.float32))
            cam.look(180.0, 15.0)
        else:
            s.check()
            scene = make_cornell_box()
            cam = make_cornell_camera(s.width, s.height)
        app = App(scene, cam, s)
        cam_data = cam.data()
        hist = app.history

        @jax.jit
        def run(c, hist):
            def body(i, carry):
                acc, h = carry
                img, _, h = app._frame(app.tracer, scene, c,
                                       i.astype(jnp.uint32), h)
                return acc + img[::64, ::64].sum(), h
            return lax.fori_loop(0, 3, body, (jnp.zeros(()), hist))

        float(run(cam_data, hist)[0])  # compile + warm
        with jax.profiler.trace(tracedir):
            float(run(cam_data, hist)[0])
        hlo_text = run.lower(cam_data, hist).compile().as_text()
    elif config == "animated":
        frame_fn, cam = _animated_setup(1920, 1080)

        @jax.jit
        def run(c):
            def body(i, acc):
                img, _ = frame_fn(c, i)
                return acc + img[::64, ::64].sum()
            return lax.fori_loop(0, 3, body, jnp.zeros(()))

        float(run(cam))
        with jax.profiler.trace(tracedir):
            float(run(cam))
        hlo_text = run.lower(cam).compile().as_text()
    else:
        from tpu_pbrt.models.cornell import (make_cornell_box,
                                             make_cornell_camera)
        from tpu_pbrt.ops import tracer as tracer_mod
        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import _render_frame

        if config in ("sphere", "sphere-textured", "helmet",
                      "helmet-textured"):
            scene, settings, textures, tex_srgb = _sphere_setup(
                config.endswith("-textured"),
                shape="helmet" if config.startswith("helmet") else "sphere")
            trc = tracer_mod.build_for_scene(scene, textures=textures,
                                             texture_srgb=tex_srgb)
        else:
            scene = make_cornell_box()
            trc = tracer_mod.build_for_scene(scene)
            settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                         count_rays=True,
                                         compaction_schedule=(4, 5, 6))
        cam = make_cornell_camera(1920, 1080).data()

        @jax.jit
        def run(c):
            def body(i, acc):
                img, _ = _render_frame(trc, scene, c, i.astype(jnp.uint32),
                                       width=1920, height=1080,
                                       settings=settings)
                return acc + img[::64, ::64].sum()
            return lax.fori_loop(0, 3, body, jnp.zeros(()))

        float(run(cam))
        with jax.profiler.trace(tracedir):
            float(run(cam))
        hlo_text = run.lower(cam).compile().as_text()

    with open("/tmp/tpu_pbrt_hlo.txt", "w") as f:
        f.write(hlo_text)

    # map HLO instruction name -> named_scope path from op metadata
    import re

    op_scope = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*?metadata=\{[^}]*?op_name=\"([^\"]+)\"",
        hlo_text,
    ):
        op_scope[m.group(1)] = m.group(2)

    TAGS = ("traverse", "shadow", "fetch", "nee", "bsdf", "gbuffer",
            "restir", "regir", "sharc_update", "sharc_resolve", "pathtrace",
            "denoise", "taa", "bloom_tonemap", "skin_refit")

    def scope_of(op_path: str) -> str:
        best, pos = "other", -1
        for tag in TAGS:
            i = op_path.rfind(f"{tag}/")
            if i < 0 and op_path.endswith(tag):
                i = len(op_path) - len(tag)
            if i > pos:
                best, pos = tag, i
        return best

    # aggregate leaf device events (skip nested containers: jit_/while
    # events contain their children, counting both double-counts)
    paths = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*trace.json.gz"))
    assert paths, f"no trace written under {tracedir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    by_scope = defaultdict(float)
    by_name = defaultdict(float)
    bytes_scope = defaultdict(float)
    total = 0.0
    total_bytes = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "while")) or name in ("run",):
            continue  # containers; leaves are the fusions/ops inside
        op_path = op_scope.get(name, "")
        if not op_path:
            continue  # host-side / non-HLO event
        sc = scope_of(op_path)
        by_scope[sc] += e["dur"]
        cat = e.get("args", {}).get("hlo_category", "?")
        by_name[f"{name} [{cat}] {op_path[-70:]}"] += e["dur"]
        total += e["dur"]
        # roofline: bytes_accessed tells whether a scope is BW-bound
        # (v5e HBM ~820 GB/s). Stage-local compute wins that do not cut
        # bytes cannot move a BW-bound frame — measured r4: three fetch
        # implementations, identical 42 ms frames.
        try:
            b = float(e.get("args", {}).get("bytes_accessed", 0) or 0)
        except (TypeError, ValueError):
            b = 0.0
        bytes_scope[sc] += b
        total_bytes += b

    gbs = total_bytes / 1e9
    print(f"== roofline: {gbs:.1f} GB accessed / 3 frames = "
          f"{gbs / 3:.1f} GB/frame -> {gbs * 1e3 / max(total, 1):.0f} GB/s "
          "achieved (v5e HBM ~820 GB/s) ==", file=sys.stderr)
    for sc in sorted(bytes_scope, key=lambda s: -bytes_scope[s]):
        us = by_scope.get(sc, 0.0)
        bw = bytes_scope[sc] / max(us, 1.0) * 1e-3   # GB/s
        print(f"  {sc:<16} {bytes_scope[sc] / 1e9:7.2f} GB  "
              f"@ {bw:6.0f} GB/s", file=sys.stderr)
    print("== by scope (us, 3 frames) ==", file=sys.stderr)
    for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:12.0f}  ({100 * v / max(total, 1):.1f}%)",
              file=sys.stderr)
    print("== top ops ==", file=sys.stderr)
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:12.0f}  {k[:150]}", file=sys.stderr)
    print(json.dumps({"total_us": total, "by_scope": dict(by_scope),
                      "total_bytes": total_bytes,
                      "bytes_by_scope": dict(bytes_scope)}))


def main(config: str = "cornell"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import _render_frame

    if config in ("app", "app-native", "animated", "manylight"):
        fn = {"app": bench_app,
              "app-native": lambda: bench_app(scale=1.0),
              "animated": bench_animated,
              "manylight": bench_manylight}[config]
        labels = {
            "app": ("1080p fps, 1 SPP, full frame graph "
                    "(ReSTIR DI + SHARC + denoise + TAA + bloom)"),
            "app-native": ("1080p fps, 1 SPP, NATIVE internal res (DLAA "
                           "analogue), full frame graph"),
            "animated": ("1080p fps: per-frame skinning + blocked refit "
                         "+ 4-bounce PT (5k-tri skinned tube)"),
            "manylight": ("1080p fps, 64-light interior: ReGIR + ReSTIR "
                          "DI + SHARC full frame graph"),
        }
        fps, mrays, rpf = fn()
        print(json.dumps({
            "metric": labels[config],
            "value": round(fps, 2),
            "unit": "fps",
            "vs_baseline": round(mrays / 500.0, 4),
            "extra": {"mrays_per_sec": round(mrays, 2),
                      "rays_per_frame": round(rpf),
                      "device": str(jax.devices()[0])},
        }))
        return

    width, height = 1920, 1080
    if config == "cornell-bxdf":
        # BASELINE config #2: full metallic/roughness BxDF blocks, 4 SPP
        from tpu_pbrt.models.cornell import MAT_GLASS, MAT_METAL

        scene = make_cornell_box(tall_block_material=MAT_METAL,
                                 short_block_material=MAT_GLASS)
        settings = PathTraceSettings(bounces=8, samples_per_pixel=4,
                                     count_rays=True,
                                     compaction_schedule=(4, 5, 6))
        label = "Cornell metal/glass 1080p, 4 SPP, 8 bounces"
    elif config in ("sphere", "sphere-textured", "helmet",
                    "helmet-textured", "helmet-100k"):
        # BASELINE config #3: 25k-tri glTF mesh via the culled tracer;
        # "helmet" is the Damaged-Helmet-class authored mesh (concave
        # visor, open bottom, non-uniform tri density); "-textured" adds
        # a mip-mapped base-color map; "helmet-100k" densifies the grid
        # to 101,760 tris (the >=100k-tri production-path config)
        shape = "helmet" if config.startswith("helmet") else "sphere"
        textured = config.endswith("-textured")
        nu, nv = (320, 160) if config == "helmet-100k" else (160, 80)
        scene, settings, textures, tex_srgb = _sphere_setup(
            textured, height, shape, nu=nu, nv=nv)
        ntri = 2 * (nv - 1) * nu
        label = (f"{ntri // 1000}k-tri {'textured ' if textured else ''}"
                 f"{shape} 1080p, 1 SPP, 4 bounces (culled tracer"
                 + (" + mip-mapped base color)" if textured else ")"))
    elif config == "cornell-nofold":
        # default config without stochastic pool compaction (A/B reference)
        scene = make_cornell_box()
        settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                     count_rays=True)
        label = "Cornell 1080p, 1 SPP, 8 bounces, no compaction"
    else:
        scene = make_cornell_box()
        # Stochastic pool compaction once Russian roulette starts (live
        # fractions measured: ~44% entering bounce 4, <=8% at 5, <=5% at
        # 6): the pool halves at each scheduled bounce. Unbiased
        # (tests/test_compaction.py). Measured ladder (v5e 1080p, r2 after
        # the transposed sweep): (4,5,6) 185.3 / (4,5,6,7) 187.9 (same
        # counted rays) / (3,4,5,6) 218.9 but kills ~7% of real samples —
        # default keeps every sample and the extra bounce-7 fold.
        # Override via BENCH_FOLD="3,4,5,6".
        fold = tuple(int(x) for x in
                     os.environ.get("BENCH_FOLD", "4,5,6,7").split(",") if x)
        settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                     count_rays=True,
                                     compaction_schedule=fold)
        label = "Cornell 1080p, 1 SPP, 8 bounces"
    trc = tracer_mod.build_for_scene(
        scene, textures=locals().get("textures"),
        texture_srgb=locals().get("tex_srgb"))
    cam = make_cornell_camera(width, height).data()

    # Frames are batched inside one jit (a fori over the frame index) so
    # the metric reflects sustained device throughput; single-call timings
    # through the tunneled runtime are dominated by dispatch overhead.
    def frames(n):
        def run(c):
            def body(i, carry):
                acc, rays = carry
                img, rc = _render_frame(
                    trc, scene, c, i.astype(jnp.uint32),
                    width=width, height=height, settings=settings,
                )
                return acc + img[::64, ::64].sum(), rays + rc
            return lax.fori_loop(0, n, body, (0.0, 0.0))
        return jax.jit(run)

    f_lo, f_hi = frames(1), frames(5)
    # compile + warm
    float(f_lo(cam)[0]); float(f_hi(cam)[0])

    def best_time(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, rays = f(cam)
            rays = float(rays)
            best = min(best, time.perf_counter() - t0)
        return best, rays

    t_lo, rays_lo = best_time(f_lo)
    t_hi, rays_hi = best_time(f_hi)
    per_frame = (t_hi - t_lo) / 4
    rays_per_frame = (rays_hi - rays_lo) / 4

    mrays_per_sec = rays_per_frame / per_frame / 1e6
    fps = 1.0 / per_frame
    baseline = 500.0  # Mrays/sec/chip target (BASELINE.json north_star)

    extra = {
        "fps_pt_only": round(fps, 2),
        "ms_per_frame_pt_only": round(per_frame * 1e3, 1),
        "rays_per_frame": round(rays_per_frame),
        "device": str(jax.devices()[0]),
    }
    # the flagship BASELINE metric rides along: 1080p fps with the FULL
    # frame graph (ReSTIR DI + SHARC + denoise + TAA + bloom + tonemap)
    if config == "cornell" and os.environ.get("BENCH_APP", "1") != "0":
        try:
            app_fps, app_mrays, app_rpf = bench_app()
            extra["app_fps_1080p_1spp_restir_sharc"] = round(app_fps, 2)
            extra["app_mrays_per_sec"] = round(app_mrays, 2)
            extra["app_rays_per_frame"] = round(app_rpf)
        except Exception as e:  # never lose the headline to the rider
            extra["app_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": f"Mrays/sec/chip ({label})",
        "value": round(mrays_per_sec, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_sec / baseline, 4),
        "extra": extra,
    }))


def _device_watchdog(timeout_s: float = 600.0):
    """Fail fast (one JSON line) instead of hanging forever when the
    axon backend is unavailable — device init/first-compile blocks
    indefinitely during a backend outage."""
    import threading

    def bail():
        print(json.dumps({
            "metric": "bench unavailable: TPU backend init timed out",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": f"no device response within {timeout_s:.0f}s",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(timeout_s, bail)
    t.daemon = True
    t.start()
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
    assert float(x) > 0
    t.cancel()


if __name__ == "__main__":
    _ensure_cache()
    _device_watchdog()
    if len(sys.argv) > 1 and sys.argv[1] == "breakdown":
        breakdown(sys.argv[2] if len(sys.argv) > 2 else "cornell")
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "cornell")
