import functools
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from conftest import *  # noqa
from test_multichip import _small_scene_and_cfg
from crychic_renderer_tpu.parallel import sharded
from crychic_renderer_tpu.passes import frame as fr

r, cfg = _small_scene_and_cfg()
consts = r.frame_constants(0.0)
single = np.asarray(jax.jit(functools.partial(fr.render_frame, cfg=cfg))(
    r.device_scene, consts))
mesh = sharded.make_mesh(8)
multi = np.asarray(jax.jit(functools.partial(
    sharded.render_frame_sharded, cfg=cfg, mesh=mesh))(
        r.device_scene, consts))
diff = np.abs(multi - single).max(axis=-1)
vis = diff > 0.02
print("visible mean:", vis.mean())
rows = vis.sum(axis=1)
for y in range(len(rows)):
    if rows[y]:
        print(y, rows[y], "maxdiff", diff[y].max())
