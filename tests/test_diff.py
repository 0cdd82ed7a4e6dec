"""Gradient correctness (BASELINE 'grad-allclose'): jax.grad through the
wavefront estimator vs central finite differences, and a small inverse
optimization that recovers a perturbed albedo."""
import numpy as np
import jax
import jax.numpy as jnp

from srt_tpu.diff import image_loss, render_pixels, splice
from srt_tpu.render.camera import Camera
from srt_tpu.scene.build import SceneBuilder


def _cornellette():
    b = SceneBuilder()
    red = b.lambertian(b.constant((0.65, 0.05, 0.05)))
    white = b.lambertian(b.constant((0.73, 0.73, 0.73)))
    light = b.diffuse_light(b.constant((10.0, 10.0, 10.0)))
    b.yz_rect(0, 10, 0, 10, 10, red, flip=True)
    b.xz_rect(0, 10, 0, 10, 0, white)
    lid = b.xz_rect(3, 7, 3, 7, 9.9, light, flip=True)
    b.light_rect(lid)
    cam = Camera.look_at(lookfrom=(5, 5, -12), lookat=(5, 3, 5), vfov=45.0,
                         aspect=1.0)
    return b.build(), cam


def _loss_fn(scene, cam, target, w, h):
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)

    def f(params):
        return image_loss(params, scene, cam, target, pixel_ids,
                          width=w, height=h, spp=8, max_depth=3, seed=7)
    return f


def test_grad_matches_finite_differences_albedo_and_emission():
    scene, cam = _cornellette()
    w = h = 12
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    target = render_pixels(scene, cam, pixel_ids, width=w, height=h,
                           spp=8, max_depth=3, seed=99)
    f = _loss_fn(scene, cam, target, w, h)

    params = {"tex_color": scene.tex_color}
    g = jax.grad(f)(params)["tex_color"]

    eps = 3e-3
    tc = np.asarray(scene.tex_color)
    # Check the two most influential entries per texture row.
    flat = np.abs(np.asarray(g)).sum(axis=1)
    rows = np.argsort(flat)[-2:]
    for i in rows:
        for c in range(3):
            delta = np.zeros_like(tc)
            delta[i, c] = eps
            lp = float(f({"tex_color": jnp.asarray(tc + delta)}))
            lm = float(f({"tex_color": jnp.asarray(tc - delta)}))
            fd = (lp - lm) / (2 * eps)
            an = float(g[i, c])
            # Same random stream on both sides: FD is exact up to O(eps^2).
            assert abs(fd - an) < 3e-3 + 0.05 * abs(fd), (i, c, fd, an)


def test_grad_nonzero_for_material_params():
    """Roughness (Beckmann alpha) and dielectric IOR receive gradients."""
    b = SceneBuilder()
    rough = b.beckmann(b.constant((0.9, 0.9, 0.9)), 0.3, 0.3)
    light = b.diffuse_light(b.constant((8.0, 8.0, 8.0)))
    b.sphere((0, 0, 0), 1.0, rough)
    lid = b.xz_rect(-2, 2, -2, 2, 4, light, flip=True)
    b.light_rect(lid)
    scene = b.build()
    cam = Camera.look_at(lookfrom=(0, 1, -5), lookat=(0, 0, 0), vfov=35.0,
                         aspect=1.0)
    w = h = 10
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    target = render_pixels(scene, cam, pixel_ids, width=w, height=h,
                           spp=8, max_depth=3, seed=3) * 0.8

    def f(params):
        return image_loss(params, scene, cam, target, pixel_ids,
                          width=w, height=h, spp=8, max_depth=3, seed=7)

    g = jax.grad(f)({"mat_params": scene.mat_params})["mat_params"]
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[0, :2]).sum() > 0.0   # alpha_x, alpha_y of the beckmann


def test_inverse_recovers_albedo():
    """Gradient descent pulls a wrong wall color toward the target color."""
    import optax
    from srt_tpu.diff import make_train_step

    scene, cam = _cornellette()
    w = h = 12
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    target = render_pixels(scene, cam, pixel_ids, width=w, height=h,
                           spp=8, max_depth=3, seed=0)

    wrong = np.asarray(scene.tex_color).copy()
    true_red = wrong[0].copy()       # tex 0 = the red wall color
    wrong[0] = [0.3, 0.3, 0.6]
    params = {"tex_color": jnp.asarray(wrong)}

    opt = optax.adam(5e-2)
    step = make_train_step(scene, cam, opt, width=w, height=h, spp=8,
                           max_depth=3)
    state = opt.init(params)
    start_err = float(jnp.abs(params["tex_color"][0] - true_red).sum())
    for it in range(40):
        params, state, loss = step(params, state, target, it)
    end_err = float(jnp.abs(params["tex_color"][0] - true_red).sum())
    assert end_err < 0.5 * start_err, (start_err, end_err)
