"""Report worklist phase A/B item counts + fits at a scene scale."""
import sys
import jax, jax.numpy as jnp, numpy as np
from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
scene, cam = sphere_grid(n, n)
arrays, meta = flatten_scene(scene)
cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                   stack_size=meta.stack_size, light_count=meta.light_count)
o, d = rays_for(cam, cfg)
od, tm, r = wl._prep_rays_wl(o, d)
ctab, cbox3, sboxv, cpad, cs, hyper = wl._pad_tables(arrays)
nb = od.shape[1] // wl.RB
print(f"tris={arrays.world_tris.shape[0]} cs={cs} "
      f"hyper={'None' if hyper is None else (hyper[2], hyper[3])}")
out = jax.jit(lambda od, tm: wl._phases(arrays, od, tm, False))(od, tm)
bf = np.asarray(out[2]); fits = bool(out[5])
valid = (bf & 1) == 1
print(f"items={valid.sum()} cap_s={out[7]} fits={fits}")
if hyper is not None:
    hsup, hboxv, nh, hs = hyper
    tlo_h = jax.jit(lambda od, tm: wl._cull_super(hboxv, od, tm))(od, tm)
    gm = np.asarray(tlo_h)[:, :nh] < wl.BIG
    print(f"hyper items={gm.sum()} ({gm.sum()/nb:.1f}/block) "
          f"cap_h={int(min(max(nb*8,1024), wl.MAX_HYPER, nb*nh))}")
