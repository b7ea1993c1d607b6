"""MVS pipeline tests: warping parity, depth→point geometry, fusion, E2E init."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import Options
from pointnerf_tpu.data import create_dataset
from pointnerf_tpu.models.mvs import points_model as pm
from pointnerf_tpu.models.mvs import fusion
from pointnerf_tpu.models.mvs.mvsnet import (homo_warping, init_mvsnet,
                                             mvsnet_forward)

from fixtures import make_nerf_synth_scene

RNG = np.random.RandomState(0)


def torch_homo_warping(src_fea, proj, depth_values):
    """Verbatim re-expression of reference module.py:36-71 semantics."""
    batch, channels = src_fea.shape[0], src_fea.shape[1]
    num_depth = depth_values.shape[1]
    height, width = src_fea.shape[2], src_fea.shape[3]
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    y, x = torch.meshgrid(torch.arange(0, height, dtype=torch.float32),
                          torch.arange(0, width, dtype=torch.float32),
                          indexing="ij")
    y, x = y.reshape(height * width), x.reshape(height * width)
    xyz = torch.stack((x, y, torch.ones_like(x)))[None]
    rot_xyz = torch.matmul(rot, xyz)
    rot_depth_xyz = rot_xyz.unsqueeze(2).repeat(1, 1, num_depth, 1) * \
        depth_values.view(batch, 1, num_depth, 1)
    proj_xyz = rot_depth_xyz + trans.view(batch, 3, 1, 1)
    proj_xy = proj_xyz[:, :2] / proj_xyz[:, 2:3]
    gx = proj_xy[:, 0] / ((width - 1) / 2) - 1
    gy = proj_xy[:, 1] / ((height - 1) / 2) - 1
    grid = torch.stack((gx, gy), dim=3)
    warped = F.grid_sample(src_fea, grid.view(batch, num_depth * height, width, 2),
                           mode="bilinear", padding_mode="zeros",
                           align_corners=False)
    return warped.view(batch, channels, num_depth, height, width)


def test_homo_warping_parity():
    feat = RNG.randn(1, 4, 12, 10).astype(np.float32)
    # a realistic relative projection: small rotation + translation
    ang = 0.1
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    K = np.array([[20, 0, 5], [0, 20, 6], [0, 0, 1]], np.float32)
    proj = np.eye(4, dtype=np.float32)
    proj[:3, :3] = K @ R @ np.linalg.inv(K)
    proj[:3, 3] = [0.5, -0.2, 0.05]
    depths = np.linspace(2, 6, 8).astype(np.float32)

    want = torch_homo_warping(torch.from_numpy(feat),
                              torch.from_numpy(proj[None]),
                              torch.from_numpy(depths[None])).numpy()
    got = homo_warping(jnp.asarray(feat[0]), jnp.asarray(proj),
                       jnp.asarray(depths))
    np.testing.assert_allclose(np.asarray(got), want[0], atol=2e-4)


def test_depth2point_roundtrip():
    """cam depth -> ndc -> cam xyz must invert the pinhole projection."""
    K = np.array([[50.0, 0, 20], [0, 50.0, 15], [0, 0, 1]], np.float32)
    near_far = (2.0, 6.0)
    H, W = 31, 41
    depth = RNG.uniform(2.5, 5.5, (H, W)).astype(np.float32)
    ndc = (depth - near_far[0]) / (near_far[1] - near_far[0])
    cam = np.asarray(pm.depth2point(jnp.asarray(ndc[None]), jnp.asarray(K),
                                    near_far))[0]          # [H,W,3]
    np.testing.assert_allclose(cam[..., 2], depth, rtol=1e-5)
    # reproject: K @ cam should give pixel coords (arange, no half-pixel shift)
    pix = cam @ K.T
    pix = pix[..., :2] / pix[..., 2:3]
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(pix[..., 0], px, atol=1e-3)
    np.testing.assert_allclose(pix[..., 1], py, atol=1e-3)


def numpy_homo_warp_nongrid_occ(c2w, w2c, intrinsic, ref_cam_xyz, HD, WD,
                                tolerate=0.1):
    """Verbatim re-expression of reference mvs_utils.py:333-369 semantics
    (z-buffer via scatter_min over ceil-pixel cells), masks kept full-size."""
    M = ref_cam_xyz.shape[0]
    if w2c is not None:
        hom = np.concatenate([ref_cam_xyz, np.ones((M, 1), np.float32)], -1)
        src = (hom @ c2w.T @ w2c.T)[:, :3]
    else:
        src = ref_cam_xyz
    grid_xy = (src / src[:, 2:3] @ intrinsic.T)[:, :2]
    mask = (grid_xy >= 0).all(-1) & \
        (np.ceil(grid_xy) <= np.array([WD - 1, HD - 1])).all(-1)
    cam_z = src[:, 2]
    hard = np.ceil(grid_xy)
    index = (hard[:, 0] * HD + hard[:, 1]).astype(np.int64)
    zbuf = np.full(WD * HD, np.inf, np.float32)
    for i in range(M):
        if mask[i]:
            zbuf[index[i]] = min(zbuf[index[i]], cam_z[i])
    block = np.zeros(M, bool)
    block[mask] = cam_z[mask] <= zbuf[index[mask]] + tolerate
    return mask & block


def test_homo_warp_nongrid_occ_parity():
    """JAX scatter-min z-buffer vs the reference's torch_scatter semantics."""
    H, W = 24, 30
    K = np.array([[25.0, 0, 14], [0, 25.0, 11], [0, 0, 1]], np.float32)
    ang = 0.15
    Rm = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = Rm
    w2c[:3, 3] = [0.1, -0.05, 0.2]
    c2w_ref = np.eye(4, dtype=np.float32)  # ref cam frame == world

    # random points, including duplicates along shared lines of sight so the
    # z-buffer actually rejects some
    pts = RNG.uniform([-1.2, -1.0, 2.0], [1.2, 1.0, 6.0],
                      (400, 3)).astype(np.float32)
    near = pts[:150].copy()
    far = near * np.array([1.0, 1.0, 1.0]) + 0
    far = near / near[:, 2:3] * (near[:, 2:3] + RNG.uniform(0.3, 2.0, (150, 1)))
    pts = np.concatenate([pts, far.astype(np.float32)], 0)

    want = numpy_homo_warp_nongrid_occ(c2w_ref, w2c, K, pts, H, W)
    _, got = pm.homo_warp_nongrid_occ(jnp.asarray(c2w_ref), jnp.asarray(w2c),
                                      jnp.asarray(K), jnp.asarray(pts), H, W)
    got = np.asarray(got)
    assert want.sum() > 50 and want.sum() < len(pts)   # z-buffer active
    np.testing.assert_array_equal(got, want)


def test_extract_2d_depth_occ_masks_occluded():
    """With depth_occ, a point hidden behind another (same src pixel cell,
    farther along the ray) must contribute zero features."""
    H = W = 16
    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]], np.float32)
    c2ws = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    w2cs = c2ws.copy()
    # two points on the SAME src-view ray: z=2 (front) and z=5 (occluded)
    pts = np.array([[0.1, 0.1, 2.0], [0.25, 0.25, 5.0]], np.float32)
    feat = np.ones((2, 3, H, W), np.float32)        # [V,C,h,w]
    img_feats = [jnp.asarray(feat), jnp.asarray(feat)]
    feats_occ, _ = pm.extract_2d(img_feats, [1], [1], jnp.asarray(np.tile(
        K[None], (2, 1, 1))), jnp.asarray(c2ws), jnp.asarray(w2cs),
        jnp.asarray(pts), H, W, cam_vid=0, depth_occ=1)
    feats_no, _ = pm.extract_2d(img_feats, [1], [1], jnp.asarray(np.tile(
        K[None], (2, 1, 1))), jnp.asarray(c2ws), jnp.asarray(w2cs),
        jnp.asarray(pts), H, W, cam_vid=0, depth_occ=0)
    feats_occ, feats_no = np.asarray(feats_occ), np.asarray(feats_no)
    assert feats_no[0].sum() > 0 and feats_no[1].sum() > 0
    assert feats_occ[0].sum() > 0          # front point still sampled
    assert feats_occ[1].sum() == 0         # occluded point masked


def test_geometric_consistency():
    """Two views of the z=0 plane with exact analytic depth must be consistent;
    corrupting one view's depth must break it."""
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    H = W = 32

    def make_view(campos):
        fwd = -campos / np.linalg.norm(campos)
        up = np.array([0, 0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_c2w = np.stack([right, down, fwd], axis=1)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R_c2w.T
        E[:3, 3] = -R_c2w.T @ campos
        px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        d_cam = np.stack([(px - K[0, 2]) / K[0, 0],
                          (py - K[1, 2]) / K[1, 1], np.ones_like(px)], -1)
        d_w = d_cam @ R_c2w.T
        t = (0.0 - campos[2]) / d_w[..., 2]
        depth = t.astype(np.float32)  # z-depth since d_cam z == 1
        return E, depth

    E1, d1 = make_view(np.array([0.3, 0.2, 3.0]))
    E2, d2 = make_view(np.array([-0.2, 0.4, 2.8]))
    mask, vis, _ = fusion.check_geometric_consistency(
        jnp.asarray(d1), jnp.asarray(K), jnp.asarray(E1),
        jnp.asarray(d2), jnp.asarray(K), jnp.asarray(E2))
    m = np.asarray(mask)
    # central region reprojects into view 2 and must be consistent
    assert m[8:24, 8:24].mean() > 0.95, m.mean()
    # corrupt src depth -> inconsistent
    mask_bad, _, _ = fusion.check_geometric_consistency(
        jnp.asarray(d1), jnp.asarray(K), jnp.asarray(E1),
        jnp.asarray(d2 * 1.3), jnp.asarray(K), jnp.asarray(E2))
    assert np.asarray(mask_bad)[8:24, 8:24].mean() < 0.05


def test_mvsnet_forward_shapes():
    key = jax.random.PRNGKey(0)
    params = init_mvsnet(key)
    # cost-volume dims (D, H/4, W/4) must be divisible by 8 for the 3-level
    # U-Net skips — the same constraint the reference inherits from official
    # MVSNet (800x800 -> 200x200 features, 200 = 8*25)
    imgs = jnp.asarray(RNG.rand(3, 3, 32, 64).astype(np.float32))
    proj = jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None, :3], (3, 1, 1)))
    dvals = jnp.linspace(2.0, 6.0, 16)
    depth, conf, prob = mvsnet_forward(params, imgs, proj, dvals)
    assert depth.shape == (8, 16)
    assert conf.shape == (8, 16)
    assert prob.shape == (16, 8, 16)
    assert np.isfinite(np.asarray(depth)).all()
    d = np.asarray(depth)
    assert d.min() >= 2.0 - 1e-4 and d.max() <= 6.0 + 1e-4
    c = np.asarray(conf)
    assert c.min() >= 0 and c.max() <= 1 + 1e-5
    p = np.asarray(prob)
    np.testing.assert_allclose(p.sum(0), 1.0, rtol=1e-4)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mvs_scene"))
    make_nerf_synth_scene(root, wh=(40, 40))
    return root


def analytic_depth(ds, vid):
    """Exact z=0-plane z-depth per pixel (0 where the ray misses the plate),
    using the same pixel convention as depth2point (no half-pixel shift)."""
    K = ds.intrinsics[vid]
    c2w = ds.cam2worlds[vid]
    W, H = ds.img_wh
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    d_cam = np.stack([(px - K[0, 2]) / K[0, 0],
                      (py - K[1, 2]) / K[1, 1], np.ones_like(px)], -1)
    d_w = d_cam @ c2w[:3, :3].T
    campos = c2w[:3, 3]
    t = (0.0 - campos[2]) / d_w[..., 2]
    hit = campos + t[..., None] * d_w
    inside = (t > 0) & (np.abs(hit[..., 0]) <= 0.4) & (np.abs(hit[..., 1]) <= 0.4)
    return np.where(inside, t, 0.0).astype(np.float32)


def test_gen_points_mode0_lands_on_plate(scene):
    """GT-depth mode: generated world points must lie on the z=0 plate."""
    opt = Options(
        data_root=scene, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(40, 40), near_plane=2.0, far_plane=4.5, bg_color="white",
        manual_depth_view=0, init_view_num=3, depth_vid="0",
        manual_std_depth=0.0, num_each_depth=1,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        depth_conf_thresh=0.5, geo_cnsst_num=0, full_comb=1,
    )
    ds = create_dataset(opt, split="train")
    sample = ds.get_init_item(0)
    vids = sample["view_ids"]
    # swap in analytic depth for the reference view
    depths = np.stack([analytic_depth(ds, ds.id_list.index(v)) for v in vids])
    sample = dict(sample, depths_h=depths)

    params = pm.init_mvs_points_params(jax.random.PRNGKey(0), opt)
    out = pm.gen_points(params, opt, sample, jax.random.PRNGKey(1))
    keep = np.asarray(out["keep"]).astype(bool)
    xyz = np.asarray(out["xyz_w"])[keep]
    # exactly the pixels whose rays hit the plate survive the near/far mask
    assert len(xyz) == int((depths[0] > 0).sum())
    assert len(xyz) > 50
    # points lie on the plate plane, within its extent
    assert np.abs(xyz[:, 2]).max() < 1e-2, np.abs(xyz[:, 2]).max()
    assert np.abs(xyz[:, :2]).max() < 0.45
    emb = np.asarray(out["embedding"])[keep]
    assert emb.shape[1] == opt.point_features_dim
    assert np.isfinite(emb).all()
    assert np.asarray(out["dir"])[keep].shape[1] == 3
    assert np.asarray(out["color"])[keep].shape[1] == 3


def test_gen_points_filter_embeddings_e2e(tmp_path_factory):
    """Full BRANCH B with MVSNet (random weights, mode 1): shapes + hull mask
    keep points inside the scene ranges. Image dims are multiples of 32 —
    the official-MVSNet U-Net constraint."""
    from pointnerf_tpu.run.common import gen_points_filter_embeddings
    root = str(tmp_path_factory.mktemp("mvs64"))
    make_nerf_synth_scene(root, wh=(64, 64), n_train=8, n_test=2)
    opt = Options(
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(64, 64), near_plane=2.0, far_plane=4.5, bg_color="white",
        manual_depth_view=1, init_view_num=3, depth_vid="0", depth_grid=24,
        manual_std_depth=0.0, num_each_depth=1,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        depth_conf_thresh=0.1, geo_cnsst_num=0, full_comb=0,
        ranges=(-0.55, -0.55, -0.2, 0.55, 0.55, 0.2), vox_res=40,
        default_conf=0.4,
    )
    ds = create_dataset(opt, split="train")
    # limit to 2 triplets for speed
    ds.view_id_list = ds.view_id_list[:2]
    state = gen_points_filter_embeddings(opt, ds, jax.random.PRNGKey(0))
    n = int(np.asarray(state["mask"]).sum())
    xyz = np.asarray(state["xyz"])[np.asarray(state["mask"])]
    if n > 0:  # random-weight MVSNet depth may be rejected wholesale
        assert np.all(xyz >= np.asarray(opt.ranges[:3]) - 1e-5)
        assert np.all(xyz <= np.asarray(opt.ranges[3:]) + 1e-5)
        assert np.isfinite(np.asarray(state["embedding"])[:n]).all()
        np.testing.assert_allclose(
            np.asarray(state["conf"])[np.asarray(state["mask"])], 0.4)


def test_reassign_conf_formula():
    """reassign_conf matches the reference expression (filter_utils.py:296-299):
    conf *= 1 - 1/1.14869^clamp(geo_sum - geo_cnsst_num + 1, 1, 10)."""
    conf = jnp.asarray(RNG.rand(4, 5).astype(np.float32))
    geo_sum = jnp.asarray(RNG.randint(0, 12, (4, 5)).astype(np.int32))
    got = np.asarray(fusion.reassign_conf(conf, geo_sum, geo_cnsst_num=2))
    t_conf = torch.from_numpy(np.asarray(conf))
    t_geo = torch.from_numpy(np.asarray(geo_sum)) - 2 + 1
    want = t_conf * (1 - 1.0 / torch.pow(
        torch.tensor(1.14869), torch.clamp(t_geo, min=1, max=10)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)


def test_gen_points_far_plane_shift(scene):
    """--far_plane_shift adds a conf-0.02 background shell behind the far
    plane for every pixel the fusion rejected (reference filter_utils.py
    :273-281)."""
    opt = Options(
        data_root=scene, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(40, 40), near_plane=2.0, far_plane=4.5, bg_color="white",
        manual_depth_view=0, init_view_num=3, depth_vid="0",
        manual_std_depth=0.0, num_each_depth=1,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        depth_conf_thresh=0.5, geo_cnsst_num=0, full_comb=1,
        far_plane_shift=0.5,
    )
    ds = create_dataset(opt, split="train")
    sample = ds.get_init_item(0)
    vids = sample["view_ids"]
    depths = np.stack([analytic_depth(ds, ds.id_list.index(v)) for v in vids])
    sample = dict(sample, depths_h=depths)

    params = pm.init_mvs_points_params(jax.random.PRNGKey(0), opt)
    out = pm.gen_points(params, opt, sample, jax.random.PRNGKey(1))
    keep = np.asarray(out["keep"]).astype(bool)
    n_hit = int((depths[0] > 0).sum())
    n_miss = 40 * 40 - n_hit
    # every rejected pixel contributes exactly one shell point
    assert keep.sum() == n_hit + n_miss == 40 * 40
    conf = np.asarray(out["conf"])[keep][:, 0]
    xyz = np.asarray(out["xyz_w"])[keep]
    shell = conf <= 0.02 + 1e-6
    assert shell.sum() == n_miss
    # shell points sit at camera depth far+shift (camera at radius 4,
    # scene-centered): world distance from the view camera ~= 5.0
    campos = ds.cam2worlds[ds.id_list.index(vids[0])][:3, 3]
    dist = np.linalg.norm(xyz[shell] - campos, axis=-1)
    assert dist.min() > 4.9, dist.min()
    # foreground points still on the plate
    assert np.abs(xyz[~shell][:, 2]).max() < 1e-2


def test_gen_points_probnet_mode(tmp_path_factory):
    """manual_depth_view == -1: learned-prob init produces finite points
    inside the frustum, prob volumes normalize, and gradients flow into
    ProbNet (it trains end-to-end through conf/xyz)."""
    root = str(tmp_path_factory.mktemp("mvs_prob"))
    make_nerf_synth_scene(root, wh=(64, 64), n_train=8, n_test=2)
    opt = Options(
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(64, 64), near_plane=2.0, far_plane=4.5, bg_color="white",
        manual_depth_view=-1, init_view_num=3, depth_vid="0",
        depth_grid=16, pad=8, num_neighbor=3, dprob_thresh=0.05,
        num_each_depth=1,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        full_comb=1,
    )
    ds = create_dataset(opt, split="train")
    sample = ds.get_init_item(0)
    params = pm.init_mvs_points_params(jax.random.PRNGKey(0), opt)
    assert "probnet" in params

    out = pm.gen_points(params, opt, sample, jax.random.PRNGKey(1))
    # padded quarter-res grid: (64/4 + 2*8)^2 points per depth view
    hp = 64 // 4 + 2 * 8
    assert out["xyz_w"].shape == (hp * hp, 3)
    assert np.isfinite(np.asarray(out["xyz_w"])).all()
    assert np.isfinite(np.asarray(out["embedding"])).all()
    conf = np.asarray(out["conf"])
    assert conf.min() >= 0 and conf.max() <= 1 + 1e-5
    assert np.asarray(out["keep"]).sum() > 0  # low thresh keeps points

    # kept points lie within the near/far camera depth range of view 0
    w2c = np.asarray(sample["w2cs"][0])
    keep = np.asarray(out["keep"]).astype(bool)
    xyz = np.asarray(out["xyz_w"])[keep]
    z = (np.concatenate([xyz, np.ones_like(xyz[:, :1])], -1) @ w2c.T)[:, 2]
    assert z.min() >= 2.0 - 1e-3 and z.max() <= 4.5 + 1e-3

    # gradients reach the ProbNet through conf + point positions
    def f(probnet_params):
        p2 = dict(params, probnet=probnet_params)
        o = pm.gen_points(p2, opt, sample, jax.random.PRNGKey(1))
        return jnp.sum(o["conf"]) + jnp.sum(o["xyz_w"] * 1e-3)
    g = jax.grad(f)(params["probnet"])
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_homo_warp_pad_identity():
    """An identity projection must reproduce the source exactly on the
    unpadded interior (ADVICE r2: the (W-1)/2 normalization requires
    align_corners=True sampling; with align_corners=False an identity warp
    was off by a spatially varying shift up to +-0.5 px)."""
    from pointnerf_tpu.models.mvs.probnet import homo_warp_pad
    src = jnp.asarray(RNG.randn(4, 10, 12).astype(np.float32))
    proj = jnp.eye(3, 4, dtype=jnp.float32)        # src cam == ref cam
    depths = jnp.asarray([1.0, 2.5], jnp.float32)
    pad = 2
    warped, inb = homo_warp_pad(src, proj, depths, pad)
    assert warped.shape == (4, 2, 10 + 2 * pad, 12 + 2 * pad)
    core = warped[:, :, pad:-pad, pad:-pad]
    for d in range(2):  # depth-independent under identity projection
        np.testing.assert_allclose(np.asarray(core[:, d]), np.asarray(src),
                                   rtol=0, atol=1e-5)
    # padded border is out of bounds for the source grid
    assert np.asarray(inb)[0, 0, 0] == False  # noqa: E712


def test_topk_depth_hypotheses_torch_parity():
    """manual_depth_view >= 2 extraction matches the reference torch expression
    (mvs_points_model.py:322-334: torch.topk over the softmax prob volume,
    depth_values lookup, nearest interpolation to image res)."""
    D, h, w, dnum, H, W = 12, 6, 8, 3, 24, 32
    prob = RNG.rand(D, h, w).astype(np.float32)
    prob = prob / prob.sum(0, keepdims=True)
    dvals = np.linspace(2.0, 4.5, D).astype(np.float32)

    d_got, c_got = pm.topk_depth_hypotheses(
        jnp.asarray(prob), jnp.asarray(dvals), dnum, (H, W))

    t_prob = torch.from_numpy(prob)[None]                 # [1,D,h,w]
    c_want, idx = torch.topk(t_prob, dnum, dim=1)         # [1,dnum,h,w]
    d_want = torch.from_numpy(dvals)[idx.view(-1)].view(1, dnum, h, w)
    d_want = F.interpolate(d_want, size=(H, W), mode="nearest")[0]
    c_want = F.interpolate(c_want, size=(H, W), mode="nearest")[0]
    np.testing.assert_allclose(np.asarray(d_got), d_want.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_got), c_want.numpy(), rtol=1e-6)


def test_gen_points_multi_depth_view(tmp_path_factory):
    """manual_depth_view=3: each pixel contributes 3 depth hypotheses, conf is
    the 0.3-scaled top-k probability, keep thresholds the UNscaled conf with
    no geometric consistency (reference filter_utils.py:230-235)."""
    root = str(tmp_path_factory.mktemp("mvs_md"))
    make_nerf_synth_scene(root, wh=(64, 64), n_train=8, n_test=2)
    opt = Options(
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(64, 64), near_plane=2.0, far_plane=4.5, bg_color="white",
        manual_depth_view=3, init_view_num=3, depth_vid="0", depth_grid=24,
        manual_std_depth=0.0, num_each_depth=1,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        depth_conf_thresh=0.02, geo_cnsst_num=0, full_comb=0,
    )
    ds = create_dataset(opt, split="train")
    sample = ds.get_init_item(0)
    params = pm.init_mvs_points_params(jax.random.PRNGKey(0), opt)
    out = pm.gen_points(params, opt, sample, jax.random.PRNGKey(1))

    H = W = 64
    assert out["xyz_w"].shape == (3 * H * W, 3)           # dnum hypotheses/px
    assert np.isfinite(np.asarray(out["xyz_w"])).all()
    conf = np.asarray(out["conf"]).reshape(-1)
    keep = np.asarray(out["keep"]).astype(bool)
    # conf is a 0.3-scaled softmax prob: bounded by 0.3
    assert conf.min() >= 0 and conf.max() <= 0.3 + 1e-6
    # top-1 of a 24-bin softmax is >= 1/24 > thresh: some rows survive
    assert keep.sum() > 0
    # keep == (unscaled conf > thresh) & nearfar: all kept rows obey it
    assert (conf[keep] / 0.3 > opt.depth_conf_thresh - 1e-6).all()
    # kept points lie in the near/far depth range of the ref view
    w2c = np.asarray(sample["w2cs"][0])
    xyz = np.asarray(out["xyz_w"])[keep]
    z = (np.concatenate([xyz, np.ones_like(xyz[:, :1])], -1) @ w2c.T)[:, 2]
    assert z.min() >= 2.0 - 1e-3 and z.max() <= 4.5 + 1e-3
