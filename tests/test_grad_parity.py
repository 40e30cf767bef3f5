"""End-to-end render parity vs a torch oracle: values AND gradients.

The oracle re-expresses the reference's forward math (ray generation through
inverted matrices, stratified-off sampling, the official-NeRF MLP, epsilon
compositing) in torch using OUR parameters, then torch autograd provides golden
gradients — the `allclose` gradient-parity check from the BASELINE north star,
without importing reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

torch = pytest.importorskip("torch")

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.render import RenderConfig, render_nope_nerf, EPSILON
from nope_nerf_tpu.geometry import make_c2w, pixel_grid
from nope_nerf_tpu.geometry.camera import intrinsics_ndc

NCFG = NerfConfig(hidden_dim=64, compute_dtype="float32")
RCFG = RenderConfig(num_points=24, depth_range=(0.01, 10.0))
N_RAYS = 32


def torch_render(params_np, pixels, depth, K, world, r_vec, t_vec):
    """The reference forward math in torch (model/rendering.py:36-126 +
    official_nerf.py:60-96 + common.py:112-310), differentiable in params and the
    axis-angle pose."""
    t = {k: torch.tensor(np.asarray(v), dtype=torch.float64, requires_grad=True)
         for k, v in params_np.items()}
    r = torch.tensor(r_vec, dtype=torch.float64, requires_grad=True)
    tr = torch.tensor(t_vec, dtype=torch.float64, requires_grad=True)

    # Exp map (common.py:290-310)
    skew = torch.zeros(3, 3, dtype=torch.float64)
    skew[0, 1], skew[0, 2] = -r[2], r[1]
    skew[1, 0], skew[1, 2] = r[2], -r[0]
    skew[2, 0], skew[2, 1] = -r[1], r[0]
    norm = r.norm() + 1e-15
    R = (torch.eye(3, dtype=torch.float64) + (torch.sin(norm) / norm) * skew
         + ((1 - torch.cos(norm)) / norm ** 2) * (skew @ skew))
    c2w = torch.eye(4, dtype=torch.float64)
    c2w = torch.cat([torch.cat([R, tr[:, None]], 1),
                     torch.tensor([[0., 0., 0., 1.]], dtype=torch.float64)], 0)
    world_t = torch.inverse(c2w)

    Kt = torch.tensor(K, dtype=torch.float64)
    P = torch.inverse(world_t) @ torch.inverse(Kt)
    px = torch.tensor(pixels, dtype=torch.float64)
    d = torch.tensor(depth, dtype=torch.float64)

    ones = torch.ones(px.shape[0], 1, dtype=torch.float64)
    # camera origin / pixels at depth 1 / prior surface points
    origin = (P @ torch.tensor([0., 0., 0., 1.], dtype=torch.float64))[:3]
    hom1 = torch.cat([px, ones, ones], 1)
    pw = (hom1 @ P.T)[:, :3]
    ray = pw - origin
    ray_norm = ray.norm(dim=1, keepdim=True)
    ray = ray / ray_norm

    homd = torch.cat([px * d, d, ones], 1)
    surf = (homd @ P.T)[:, :3]
    d_i = (surf - origin).norm(dim=1)

    # z samples: linspace, no noise
    s = RCFG.num_points
    z = torch.linspace(0, 1, s, dtype=torch.float64)
    z = RCFG.depth_range[0] * (1 - z) + RCFG.depth_range[1] * z
    z = z[None, :].expand(px.shape[0], s)
    pts = origin[None, None, :] + ray[:, None, :] * z[..., None]
    dirs = (-ray)[:, None, :].expand_as(pts)

    # MLP (official_nerf.py)
    def enc(x, L):
        out = [x]
        for i in range(L):
            out += [torch.sin(2.0 ** i * x), torch.cos(2.0 ** i * x)]
        return torch.cat(out, -1)

    flat = pts.reshape(-1, 3)
    dflat = dirs.reshape(-1, 3)
    pe = enc(flat, 10)
    x = pe
    for i in range(4):
        x = torch.relu(x @ t[f"trunk0_{i}_w"] + t[f"trunk0_{i}_b"])
    x = torch.cat([x, pe], -1)
    for i in range(4):
        x = torch.relu(x @ t[f"trunk1_{i}_w"] + t[f"trunk1_{i}_b"])
    density = torch.nn.functional.softplus(x @ t["density_w"] + t["density_b"])
    density = 1 - torch.exp(-density)           # dist_alpha=False
    de = enc(dflat, 4)
    feat = x @ t["feature_w"] + t["feature_b"]
    hcat = torch.cat([feat, de], -1)
    h = torch.relu(hcat @ t["rgb_hidden_w"] + t["rgb_hidden_b"])
    rgb = torch.sigmoid(h @ t["rgb_w"] + t["rgb_b"])

    rgb = rgb.reshape(-1, s, 3)
    alpha = density.reshape(-1, s)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[:, :1]), 1 - alpha + EPSILON], -1), -1)[:, :-1]
    w = alpha * trans
    rgb_out = (w[..., None] * rgb).sum(-2)
    dist = (w * z).sum(-1)

    loss = rgb_out.square().mean() + 0.04 * (dist - d_i).abs().mean()
    loss.backward()
    grads = {k: v.grad.numpy() for k, v in t.items()}
    return (rgb_out.detach().numpy(), dist.detach().numpy(),
            d_i.detach().numpy(), loss.item(), grads,
            r.grad.numpy(), tr.grad.numpy())


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    params = init_nerf_params(jax.random.key(3), NCFG)
    params_np = {k: np.asarray(v) for k, v in params.items()}
    K = np.asarray(intrinsics_ndc(30.0, 30.0, 32, 24))
    r_vec = rng.randn(3) * 0.1
    t_vec = rng.randn(3) * 0.5
    _, pix = pixel_grid((24, 32))
    pixels = np.asarray(pix[rng.choice(24 * 32, N_RAYS, replace=False)])
    depth = rng.uniform(2.0, 6.0, (N_RAYS, 1)).astype(np.float64)
    return params, params_np, K, r_vec, t_vec, pixels, depth


def _jax_loss(params, r_vec, t_vec, pixels, depth, K):
    c2w = make_c2w(r_vec, t_vec)
    world = jnp.linalg.inv(c2w)
    out = render_nope_nerf(params, pixels, depth, K, world, None, None,
                           RCFG, NCFG, add_noise=False)
    return (jnp.mean(out["rgb"] ** 2)
            + 0.04 * jnp.mean(jnp.abs(out["depth_pred"] - out["depth_gt"])), out)


def test_forward_values_match_torch_oracle(setup):
    params, params_np, K, r_vec, t_vec, pixels, depth = setup
    rgb_t, dist_t, d_i_t, loss_t, _, _, _ = torch_render(
        params_np, pixels, depth, K, None, r_vec, t_vec)
    loss_j, out = _jax_loss(params, jnp.asarray(r_vec, jnp.float32),
                            jnp.asarray(t_vec, jnp.float32),
                            jnp.asarray(pixels, jnp.float32),
                            jnp.asarray(depth, jnp.float32), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth_pred"]), dist_t, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["depth_gt"]), d_i_t, atol=2e-3)
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=2e-4)


def test_gradients_match_torch_oracle(setup):
    params, params_np, K, r_vec, t_vec, pixels, depth = setup
    _, _, _, _, g_torch, gr_t, gt_t = torch_render(
        params_np, pixels, depth, K, None, r_vec, t_vec)

    def loss_fn(params, r, t):
        return _jax_loss(params, r, t, jnp.asarray(pixels, jnp.float32),
                         jnp.asarray(depth, jnp.float32), jnp.asarray(K))[0]

    g_params, g_r, g_t = jax.grad(loss_fn, argnums=(0, 1, 2))(
        params, jnp.asarray(r_vec, jnp.float32), jnp.asarray(t_vec, jnp.float32))

    for k in g_torch:
        a = g_torch[k]
        b = np.asarray(g_params[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=f"param grad mismatch {k}")
    # the north-star check: gradients INTO THE POSE match
    for name, a, b in [("r", gr_t, g_r), ("t", gt_t, g_t)]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(b) / scale, a / scale, atol=2e-3,
                                   err_msg=f"pose grad mismatch {name}")
        assert np.abs(a).max() > 0
