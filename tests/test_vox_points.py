"""Parity tests for the construct_vox_points_* family and the load_points==3
mesh+depth occupancy filter, against torch re-expressions of the reference
(models/mvs/mvs_utils.py:484-561, run/train_ft.py:649-695)."""

import numpy as np
import torch

from pointnerf_tpu.run.common import (
    construct_vox_points_xyz, construct_vox_points_ind,
    filter_depth_by_pc_occupancy, init_point_state_from_dataset,
)


def torch_vox_partition(xyz, vox_res, space_min=None, space_max=None):
    """Reference mvs_utils.py:484-500 partition, verbatim semantics."""
    if space_min is None:
        xyz_min, xyz_max = torch.min(xyz, dim=-2)[0], torch.max(xyz, dim=-2)[0]
        space_edge = torch.max(xyz_max - xyz_min) * 1.05
        xyz_mid = (xyz_max + xyz_min) / 2
        space_min = xyz_mid - space_edge / 2
        space_max = xyz_mid + space_edge / 2
    else:
        space_edge = space_max - space_min
    construct_vox_sz = space_edge / vox_res
    xyz_shift = xyz - space_min[None, ...]
    coords = torch.floor(xyz_shift / construct_vox_sz).to(torch.int32)
    return coords, space_min, space_max


def torch_scatter_mean(src, index):
    n = int(index.max()) + 1
    out = torch.zeros(n, src.shape[-1], dtype=src.dtype)
    cnt = torch.zeros(n, dtype=src.dtype)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    return out / cnt[:, None]


def rand_cloud(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    # anisotropic cloud so the cubic-edge (max-extent) partition matters
    return (rng.randn(n, 3) * np.array([1.0, 0.4, 2.5])).astype(np.float32)


def test_construct_vox_points_xyz_torch_parity():
    xyz = rand_cloud()
    t = torch.from_numpy(xyz).double()
    coords, _, _ = torch_vox_partition(t, 32)
    uniq, inv = torch.unique(coords, dim=0, return_inverse=True)
    want = torch_scatter_mean(t, inv).numpy()
    got = construct_vox_points_xyz(xyz, 32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_construct_vox_points_ind_torch_parity_shared_partition():
    a, b = rand_cloud(seed=1), rand_cloud(2000, seed=2) * 1.3
    ta, tb = torch.from_numpy(a).double(), torch.from_numpy(b).double()
    ca, smin, smax = torch_vox_partition(ta, 24)
    ua, ia = torch.unique(ca, dim=0, return_inverse=True)
    cb, _, _ = torch_vox_partition(tb, 24, smin, smax)
    ub, ib = torch.unique(cb, dim=0, return_inverse=True)

    ga, inva, nsmin, nsmax = construct_vox_points_ind(a, 24)
    gb, invb, _, _ = construct_vox_points_ind(b, 24, nsmin, nsmax)
    np.testing.assert_array_equal(ga, ua.numpy())
    np.testing.assert_array_equal(inva, ia.numpy())
    np.testing.assert_allclose(nsmin, smin.numpy(), atol=1e-7)
    np.testing.assert_allclose(nsmax, smax.numpy(), atol=1e-7)
    # the second cloud reuses the first cloud's partition
    np.testing.assert_array_equal(gb, ub.numpy())
    np.testing.assert_array_equal(invb, ib.numpy())


def test_filter_depth_by_pc_occupancy_torch_parity():
    """Torch re-expression of the reference load_points==3 filter block
    (run/train_ft.py:656-672)."""
    pc, depth = rand_cloud(seed=3), rand_cloud(3000, seed=4) * 1.1
    res = 20

    tpc, td = torch.from_numpy(pc).double(), torch.from_numpy(depth).double()
    cpc, smin, smax = torch_vox_partition(tpc, res)
    pc_gid = torch.unique(cpc, dim=0)
    cd, _, _ = torch_vox_partition(td, res, smin, smax)
    d_gid, d_inv = torch.unique(cd, dim=0, return_inverse=True)
    all_grid = torch.cat([pc_gid, d_gid], dim=0)
    min_id = torch.min(all_grid, dim=-2)[0]
    max_id = torch.max(all_grid, dim=-2)[0] - min_id
    mask = torch.ones((max_id + 1).tolist())
    pcm = (pc_gid - min_id[None]).long()
    mask[pcm[:, 0], pcm[:, 1], pcm[:, 2]] = 0
    dm = (d_gid[d_inv] - min_id).long()
    keepmask = mask[dm[:, 0], dm[:, 1], dm[:, 2]] > 0
    want = depth[keepmask.numpy()]

    got = filter_depth_by_pc_occupancy(pc, depth, filter_res=res)
    np.testing.assert_allclose(got, want)
    assert 0 < len(got) < len(depth)  # filter actually removed something


def test_load_points_3_init(tmp_path):
    """load_points==3 through init_point_state_from_dataset on the ScanNet
    fixture: mesh + filtered sensor-depth points, per-source vox decay."""
    import jax
    from fixtures import make_scannet_scene
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.data import create_dataset

    make_scannet_scene(str(tmp_path), n=4, wh=(40, 30))
    opt = Options(
        data_root=str(tmp_path), scan="scene0101_04",
        dataset_name="scannet_ft", img_wh=(40, 30), load_points=3,
        random_sample="random", random_sample_size=10, vox_res=40,
        near_plane=0.1, far_plane=8.0, bg_color="black",
        ranges=(-0.55, -0.55, -0.2, 0.55, 0.55, 0.2),
        point_features_dim=16, default_conf=0.4,
    )
    ds = create_dataset(opt, split="train")
    n_mesh = len(ds.load_init_points())
    state = init_point_state_from_dataset(
        opt, ds, jax.random.PRNGKey(0))
    n = int(np.asarray(state["mask"]).sum())
    assert n > 0
    assert np.isfinite(np.asarray(state["xyz"])[np.asarray(state["mask"])]).all()
    # depth points survive the filter only off the mesh plane; the fixture's
    # mesh covers the whole plate so the merged cloud stays near it
    assert n <= n_mesh + 4 * 40 * 30
