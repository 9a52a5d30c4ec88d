"""Generate golden parity values by running the REFERENCE's pure functions
(torch CPU) on fixed random inputs, and pinning inputs+outputs to .npz.

Run from the repo root with the reference mounted at /root/reference:

    python tools/gen_goldens.py

The committed .npz files are what tests/test_parity_*.py assert against, so
the test suite has no runtime dependency on the reference or torch.
"""

import os
import sys

import numpy as np

REF = os.environ.get("SCADE_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    sys.path.insert(0, REF)
    import torch

    torch.manual_seed(0)
    from model import run_nerf_helpers as H

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)

    def save(name, **arrs):
        np.savez(os.path.join(OUT, name + ".npz"), **arrs)
        print("wrote", name, {k: v.shape for k, v in arrs.items()})

    # --- positional encoding ----------------------------------------------
    x = rng.standard_normal((17, 3)).astype(np.float32)
    for multires in (9, 10, 4):
        embed, out_dim = H.get_embedder(multires, 0)
        y = embed(torch.from_numpy(x)).numpy()
        assert y.shape[-1] == out_dim
        save(f"embed_multires{multires}", x=x, y=y)
    embed0, dim0 = H.get_embedder(0, 0)
    save("embed_multires0", x=x, y=embed0(torch.from_numpy(x)).numpy())

    # --- ray generation ----------------------------------------------------
    Himg, Wimg = 12, 17
    intr = np.array([55.0, 60.0, 8.2, 5.9], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    # a generic rotation + translation
    th = 0.33
    c2w[:3, :3] = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th) * np.cos(0.21), -np.sin(0.21)],
            [0, np.sin(0.21), np.cos(0.21)],
        ],
        dtype=np.float32,
    )
    c2w[:3, 3] = [0.3, -1.2, 2.5]
    ro, rd = H.get_rays(Himg, Wimg, torch.from_numpy(intr), torch.from_numpy(c2w))
    coords = np.stack(
        [rng.integers(0, Himg, 40), rng.integers(0, Wimg, 40)], axis=-1
    ).astype(np.float32)
    roc, rdc = H.get_rays(
        Himg, Wimg, torch.from_numpy(intr), torch.from_numpy(c2w),
        coords=torch.from_numpy(coords),
    )
    save(
        "rays",
        intr=intr, c2w=c2w, H=np.array(Himg), W=np.array(Wimg),
        rays_o=ro.numpy(), rays_d=rd.numpy(),
        coords=coords, rays_o_c=roc.numpy(), rays_d_c=rdc.numpy(),
    )

    # --- sample_pdf family --------------------------------------------------
    n_rays, n_bins = 9, 63
    bins = np.sort(rng.uniform(0.1, 8.0, (n_rays, n_bins)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (n_rays, n_bins - 1)).astype(np.float32)
    weights[0, :] = 0.0  # degenerate ray exercises the 1e-5 floor
    weights[1, 5] = 100.0  # near-delta distribution
    u = rng.uniform(0.0, 1.0, (n_rays, 128)).astype(np.float32)
    s, u_out = H.sample_pdf_return_u(
        torch.from_numpy(bins), torch.from_numpy(weights), 128,
        det=False, load_u=torch.from_numpy(u),
    )
    s_det = H.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 64, det=True
    )
    uj = np.broadcast_to(
        rng.uniform(0.0, 1.0, (1, 128)).astype(np.float32), (n_rays, 128)
    ).copy()
    sj, _ = H.sample_pdf_joint_return_u(
        torch.from_numpy(bins), torch.from_numpy(weights), 128,
        load_u=torch.from_numpy(uj),
    )
    save(
        "sample_pdf", bins=bins, weights=weights, u=u, samples=s.numpy(),
        samples_det=s_det.numpy(), u_joint=uj, samples_joint=sj.numpy(),
    )

    # --- space carving loss -------------------------------------------------
    pred = rng.uniform(0.0, 8.0, (32, 128)).astype(np.float32)
    hyp = rng.uniform(0.0, 8.0, (20, 32, 1)).astype(np.float32)
    mask = (rng.uniform(size=(32,)) > 0.3).astype(np.float32)
    outs = {}
    for is_joint in (False, True):
        for thr in (0.0, 0.5):
            key = f"j{int(is_joint)}_t{thr}"
            outs["loss_" + key] = H.compute_space_carving_loss(
                torch.from_numpy(pred), torch.from_numpy(hyp),
                is_joint=is_joint, norm_p=2, threshold=thr,
            ).numpy()
        outs[f"loss_mask_j{int(is_joint)}"] = H.compute_space_carving_loss(
            torch.from_numpy(pred), torch.from_numpy(hyp),
            is_joint=is_joint, mask=torch.from_numpy(mask),
        ).numpy()
    save("space_carving", pred=pred, hyp=hyp, mask=mask, **outs)

    # --- NeRF MLP forward (random torch-init weights) ------------------------
    embed, input_ch = H.get_embedder(9, 0)
    model = H.NeRF(
        D=8, W=256, input_ch=input_ch, input_ch_views=3, input_ch_cam=0,
        output_ch=5, skips=[4], use_viewdirs=True,
    )
    model.eval()
    pts = rng.standard_normal((50, 3)).astype(np.float32) * 0.5
    dirs = rng.standard_normal((50, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        emb = torch.cat([embed(torch.from_numpy(pts)), torch.from_numpy(dirs)], -1)
        raw = model(emb).numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    save("nerf_forward", pts=pts, dirs=dirs, raw=raw,
         **{"sd__" + k.replace(".", "__"): v for k, v in sd.items()})

    # --- compositing (raw2outputs / compute_weights) -------------------------
    # raw2outputs lives in the runner; rebuild its math here with torch to pin
    # goldens without importing the runner's heavy deps. Formulas per
    # run_scade_scannet.py:511-562.
    raw = rng.standard_normal((16, 64, 4)).astype(np.float32)
    raw[..., 3] = np.abs(raw[..., 3])
    z_vals = np.sort(rng.uniform(0.5, 8.0, (16, 64)).astype(np.float32), -1)
    rays_d = rng.standard_normal((16, 3)).astype(np.float32)
    t_raw, t_z, t_rd = map(torch.from_numpy, (raw, z_vals, rays_d))
    dists = t_z[..., 1:] - t_z[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(t_rd[..., None, :], dim=-1)
    alpha = 1.0 - torch.exp(-torch.relu(t_raw[..., 3]) * dists)
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1), -1
    )[:, :-1]
    rgb = torch.sigmoid(t_raw[..., :3])
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * t_z, -1)
    acc_map = torch.sum(weights, -1)
    disp_map = 1.0 / torch.max(
        1e-10 * torch.ones_like(depth_map), depth_map / acc_map
    )
    save(
        "raw2outputs", raw=raw, z_vals=z_vals, rays_d=rays_d,
        weights=weights.numpy(), rgb_map=rgb_map.numpy(),
        depth_map=depth_map.numpy(), acc_map=acc_map.numpy(),
        disp_map=disp_map.numpy(),
    )

    print("done")


if __name__ == "__main__":
    main()
