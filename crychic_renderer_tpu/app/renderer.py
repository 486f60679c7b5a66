"""Host-side renderer orchestration.

The functional replacement of the reference's app shell + frame loop
(/root/reference/Common/d3dApp.cpp Run/Initialize, CRYCHIC::Update/Draw):
builds the device scene once, computes per-frame constants (camera
matrices, cascade fits, culling masks) on host, and calls the jitted frame
function. CPU/GPU pipelining via 3 FrameResources (CRYCHIC.cpp:135-146)
maps to XLA async dispatch — the host runs ahead until it blocks on
fetching a frame, exactly the fence-wait pattern, with no explicit fences.
"""
from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import Camera, BoundingFrustum
from ..models import cascades as casc
from ..models.materials import build_reference_lights, MAX_LIGHTS
from ..models.scene import Scene
from ..ops import sampling, ssao as ssao_ops
from ..passes import frame as fr
from ..utils import mathutil as mu

DEFAULT_ASSET_DIR = "/root/reference/Textures"

# Texture slot names -> DDS file stems (LoadTextures, CRYCHIC.cpp:939-974;
# slots 7-9 are unused in the reference's 10-slot table).
_TEXTURE_FILES = {
    "bricks2": "bricks2.dds",
    "bricks2_nmap": "bricks2_nmap.dds",
    "tile": "tile.dds",
    "tile_nmap": "tile_nmap.dds",
    "white1x1": "white1x1.dds",
    "default_nmap": "default_nmap.dds",
    "WoodCrate01": "WoodCrate01.dds",
    "WoodCrate02": "WoodCrate02.dds",
    "bricks": "bricks.dds",
    "bricks_nmap": "bricks_nmap.dds",
    "stone": "stone.dds",
    "checkboard": "checkboard.dds",
    "ice": "ice.dds",
    "grass": "grass.dds",
}


# animated texture slots: name -> (frames dir, subsample step, fps)
_ANIM_SLOTS = {
    "bolt_anim": ("BoltAnim", 4, 30.0),
    "fire_anim": ("FireAnim", 8, 30.0),
}


def load_texture_pool(names, asset_dir=DEFAULT_ASSET_DIR):
    """Load the named texture slots into a TexturePool (mips generated for
    mipless textures, like D3D12 would sample the base level repeatedly —
    we improve on that with generated mips).

    Returns (pool, anim_specs) where anim_specs maps slot index ->
    (first_frame_texture_index, frame_count, fps) for animated slots
    (BoltAnim/FireAnim BMP sequences). Animation works by cycling the
    material's diffuse texture index per frame on the host — the frames
    all live in the pool.
    """
    from ..io import dds

    textures = []
    anim_specs = {}
    anim_tail = []  # (slot, frames) appended after the fixed slots
    for slot, name in enumerate(names):
        if name == "sky_cube":
            # cube slots don't live in the 2D pool; placeholder 1x1
            textures.append([np.full((1, 1, 4), 255, np.uint8)])
            continue
        if name in _ANIM_SLOTS:
            subdir, step, fps = _ANIM_SLOTS[name]
            d = os.path.join(asset_dir, subdir)
            files = sorted(os.listdir(d))[::step] if os.path.isdir(d) else []
            frames = [dds.generate_mips(dds.load_bmp(os.path.join(d, f)))
                      for f in files]
            if not frames:
                frames = [[np.full((1, 1, 4), 255, np.uint8)]]
            textures.append(frames[0])  # slot shows frame 0
            anim_specs[slot] = (len(names) + sum(len(f) for _, f in anim_tail),
                                len(frames), fps)
            anim_tail.append((slot, frames))
            continue
        fn = _TEXTURE_FILES.get(name)
        if fn is None or not os.path.exists(os.path.join(asset_dir, fn)):
            textures.append([np.full((1, 1, 4), 255, np.uint8)])
            continue
        tex = dds.load_dds(os.path.join(asset_dir, fn))
        mips = tex.mips
        if len(mips) == 1 and mips[0].shape[0] > 1:
            mips = dds.generate_mips(mips[0])
        textures.append(mips)
    n_big = len(textures)  # fixed material slots: big class
    for _, frames in anim_tail:
        textures.extend(frames)  # animation frames: small class
    return sampling.TexturePool.build(textures, n_big=n_big), anim_specs


def build_device_scene(scene: Scene, asset_dir=DEFAULT_ASSET_DIR,
                       lights=None) -> fr.DeviceScene:
    if lights is None:
        lights = build_reference_lights()
    pool, anim_specs = load_texture_pool(scene.texture_names, asset_dir)
    mb = scene.material_bank
    cubemap = sampling.pack_cubemap(sampling.procedural_sky_cubemap(256))
    return fr.DeviceScene(
        opaque=fr.DeviceDraw.from_host(scene.opaque),
        shadow=fr.DeviceDraw.from_host(scene.shadow),
        mat_albedo=jnp.asarray(mb.diffuse_albedo),
        mat_fresnel=jnp.asarray(mb.fresnel_r0),
        mat_roughness=jnp.asarray(mb.roughness),
        mat_metalness=jnp.asarray(mb.metalness),
        mat_transform=jnp.asarray(mb.mat_transform),
        mat_diffuse_tex=jnp.asarray(mb.diffuse_map_index),
        mat_normal_tex=jnp.asarray(mb.normal_map_index),
        tex_data=pool.data,
        cubemap=jnp.asarray(cubemap),
        light_strength=jnp.asarray(lights.strength),
        light_direction=jnp.asarray(lights.direction),
        light_position=jnp.asarray(lights.position),
        light_falloff_start=jnp.asarray(lights.falloff_start),
        light_falloff_end=jnp.asarray(lights.falloff_end),
        light_spot_power=jnp.asarray(lights.spot_power),
        ambient=jnp.asarray(lights.ambient),
        ssao_offsets=jnp.asarray(ssao_ops.build_offset_vectors()),
        ssao_random_tex=jnp.asarray(ssao_ops.pack_random_texture(
            ssao_ops.build_random_vector_texture())),
        ssao_blur_weights=jnp.asarray(ssao_ops.calc_gauss_weights(2.5)),
        tex_n_big=pool.n_big,
    ), anim_specs


class Renderer:
    """Owns the device scene + compiled frame fn; produces frames."""

    def __init__(self, scene: Scene, cfg: RenderConfig,
                 camera: Camera = None, asset_dir=DEFAULT_ASSET_DIR,
                 lights=None):
        self.scene = scene
        if cfg.use_pallas and jax.default_backend() == "cpu":
            # the Mosaic kernel targets TPU; CPU falls back to the XLA path
            import dataclasses as _dc

            cfg = _dc.replace(cfg, use_pallas=False)
        self.cfg = cfg
        self.camera = camera or self._default_camera()
        self.light_dir0 = (lights.direction[0] if lights is not None
                           else build_reference_lights().direction[0])
        self.device_scene, self.anim_specs = build_device_scene(
            scene, asset_dir, lights)
        self._base_diffuse_tex = np.asarray(
            scene.material_bank.diffuse_map_index)
        self._frame_fn = jax.jit(
            functools.partial(fr.render_frame, cfg=cfg))
        self._stats = []

    def _default_camera(self):
        cam = Camera()
        cam.set_position(0.0, 2.0, -15.0)  # CRYCHIC.cpp:46
        cam.set_lens(0.25 * np.pi, self.cfg.width / self.cfg.height,
                     1.0, 100.0)  # CRYCHIC.cpp:114
        return cam

    # -- per-frame host update (CRYCHIC::Update) ---------------------------
    def frame_constants(self, total_time: float = 0.0) -> fr.FrameConstants:
        cam = self.camera
        view = cam.view
        proj = cam.proj
        ct = casc.fit_cascades(cam, self.light_dir0, self.cfg.shadow_map_size)

        opaque_vis = self._visibility(self.scene.opaque)
        shadow_vis = self._visibility(self.scene.shadow)

        return fr.FrameConstants(
            view=jnp.asarray(view),
            proj=jnp.asarray(proj),
            view_proj=jnp.asarray(view @ proj),
            inv_proj=jnp.asarray(np.linalg.inv(proj)),
            eye_pos=jnp.asarray(cam.position),
            cascade_view_projs=jnp.asarray(ct.view_projs),
            shadow_transforms=jnp.asarray(ct.shadow_transforms),
            opaque_visibility=jnp.asarray(opaque_vis),
            shadow_visibility=jnp.asarray(shadow_vis),
            total_time=jnp.float32(total_time),
        )

    def _visibility(self, draw) -> np.ndarray:
        """Per-instance frustum culling (UpdateInstanceData,
        CRYCHIC.cpp:515-557), vectorized over all instances. Non-cullable
        instances (the OpaqueShadow layer) always pass, so shadows of
        off-screen casters stay correct (CRYCHIC.cpp:543-544)."""
        if not self.cfg.frustum_culling:
            return np.ones(draw.num_instances, np.float32)
        from ..models.camera import cull_instances

        frustum = BoundingFrustum(self.camera.proj)
        inv_view = np.linalg.inv(self.camera.view)
        inv_worlds = np.linalg.inv(draw.worlds)
        vis = cull_instances(frustum, inv_view, inv_worlds,
                             draw.bounds_center, draw.bounds_extents)
        return (vis | ~draw.cullable).astype(np.float32)

    # -- frame -------------------------------------------------------------
    def _animate_materials(self, total_time: float):
        """Cycle animated texture slots (BoltAnim/FireAnim frame sequences)
        by rewriting material->texture indices; cheap host-side update, no
        recompile (shapes unchanged)."""
        if not self.anim_specs:
            return
        tex = self._base_diffuse_tex.copy()
        for slot, (base, count, fps) in self.anim_specs.items():
            frame = int(total_time * fps) % count
            tex[self._base_diffuse_tex == slot] = base + frame
        self.device_scene.mat_diffuse_tex = jnp.asarray(tex)

    def render(self, total_time: float = 0.0) -> jnp.ndarray:
        self._animate_materials(total_time)
        consts = self.frame_constants(total_time)
        return self._frame_fn(self.device_scene, consts)

    def render_np(self, total_time: float = 0.0) -> np.ndarray:
        img = np.asarray(self.render(total_time))
        return np.clip(img, 0.0, 1.0)


def write_png(path: str, img: np.ndarray):
    """Minimal RGBA/gray PNG writer (no external deps)."""
    import struct
    import zlib

    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[..., None]
    elif img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        color_type, channels = 6, 4
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
