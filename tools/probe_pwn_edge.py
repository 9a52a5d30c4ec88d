"""Attribute pwn_edge_loss's cost across its three internal stages.

probe_prior_criterion measured pwn-edge at 28 ms fwd / 72 ms fwd+grad
(B=20 448², after the bucketed masked_sample rewrite) — the largest
residual criterion term. This probe slope-times the stages separately:

1. normal fields — surface_normal_from_depth on pred AND gt (avg pools,
   xyz, 5-patch crosses, normalize/orient; reference Surface_normal.py
   :95-213). Only the pred field carries gradient.
2. edge maps + pair sampling — sobel maps, normal-edge conv, dilated
   depth-edge masking, _edge_guided_pairs x2 + masked_sample (reference
   PWN_edges.py:155-192, ranking_loss.py:60-107). No gradient w.r.t.
   pred flows here (all inputs are gt/rgb).
3. gathers + cos regression — (n,3) row gathers at the sampled indices
   and the |cos| losses (PWN_edges.py:193-245); the backward is 3-vector
   scatter-adds into the (P,3) normal field.

Usage: python tools/probe_pwn_edge.py [--batch 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

if os.environ.get("SCADE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ks", default="2,8")
    ap.add_argument("--n_anchors", type=int, default=3000)
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    import scade_tpu.prior.losses as L

    S, B, n_anchors = args.image_size, args.batch, args.n_anchors
    rng = np.random.default_rng(0)
    pred = jnp.asarray(np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32)
    gt = jnp.asarray(np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32)
    rgb = jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32)
    focal = jnp.full((B,), 500.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    ks = tuple(int(x) for x in args.ks.split(","))

    def slope(make_chain, label):
        ts = []
        for k in ks:
            fn = make_chain(k)
            np.asarray(fn(jnp.float32(1.0)))
            np.asarray(fn(jnp.float32(2.0)))
            t0 = time.perf_counter()
            for i in range(args.iters):
                np.asarray(fn(jnp.float32(3.0 + i)))
            ts.append((time.perf_counter() - t0) / args.iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:34s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    def chain(fn, use_grad, *extra):
        # pred and every large constant are jit ARGUMENTS — closed-over
        # device arrays get baked into the HLO and bloat the tunnel's
        # compile request (HTTP 413).
        def make(k):
            @jax.jit
            def g(salt, p, *ex):
                def body(acc, i):
                    pi = p + ((salt * 1e-9) * i + acc * 0.0).astype(p.dtype)
                    v = (jax.value_and_grad(fn)(pi, *ex)[1].sum() if use_grad
                         else fn(pi, *ex))
                    return acc + v.astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc
            return lambda salt: g(salt, pred, *extra)
        return make

    # stage 1: the two normal fields (pred differentiable, gt constant)
    def normals_both(p, g):
        masks = g > -1e-8
        n_p = L.surface_normal_from_depth(p, focal, masks)
        n_g = L.surface_normal_from_depth(g, focal, masks)
        return jnp.sum(n_p) + jnp.sum(n_g)

    def normals_pred_only(p, g):
        masks = g > -1e-8
        return jnp.sum(L.surface_normal_from_depth(p, focal, masks))

    # stage 2: edge maps + pair sampling (no pred dependence — probe as a
    # function of a salt-perturbed rgb so the chain isn't DCE'd)
    n_g_const = L.surface_normal_from_depth(
        gt, focal, gt > -1e-8)

    def pairs_of(im_salted, ng_all, g_all):
        def per_image(k, im, ng, g):
            k1, k2 = jax.random.split(k)
            edges_img, thetas_img = L.sobel_edges(im[..., 0])
            A1, B1 = L._edge_guided_pairs(
                k1, edges_img, thetas_img, S, S, n_anchors, 3, 20)
            kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
            ky = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
            g_ch = jax.lax.conv_general_dilated(
                jnp.moveaxis(ng, -1, 0)[..., None],
                jnp.stack([kx, ky], -1)[:, :, None, :],
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            gxm = jnp.mean(jnp.abs(g_ch[..., 0]), axis=0)
            gym = jnp.mean(jnp.abs(g_ch[..., 1]), axis=0)
            edges_normal = jnp.pad(jnp.sqrt(gxm**2 + gym**2), ((1, 1), (1, 1)))
            thetas_normal = jnp.pad(jnp.arctan2(gym, gxm), ((1, 1), (1, 1)))
            A2, B2 = L._edge_guided_pairs(
                k2, edges_normal, thetas_normal, S, S, n_anchors, 3, 20)
            return jnp.sum(A1 + B1 + A2 + B2)
        keys = jax.random.split(key, B)
        return jnp.sum(jax.vmap(per_image)(keys, im_salted, ng_all, g_all))

    def pairs_fn(p, im, ng_all, g_all):
        # route the salt through rgb so each scan iteration is fresh work
        return pairs_of(im + jnp.mean(p) * 1e-12, ng_all, g_all)

    # stage 3: gathers + cos regression on FIXED indices, grad w.r.t. the
    # pred normal field (the scatter-add cost the backward pays)
    idx_rng = np.random.default_rng(1)
    P = S * S
    A_fix = jnp.asarray(idx_rng.integers(0, P, size=(B, 6 * n_anchors)))
    B_fix = jnp.asarray(idx_rng.integers(0, P, size=(B, 6 * n_anchors)))
    R_fix = jnp.asarray(idx_rng.integers(0, P, size=(B, 4 * n_anchors)))

    def gather_loss(p, g, ng_all, a_all, b_all, r_all):
        masks = g > -1e-8
        n_p = L.surface_normal_from_depth(p, focal, masks)

        def per_image(np_i, ng_i, a, b, r):
            np_f = np_i.reshape(-1, 3)
            ng_f = ng_i.reshape(-1, 3)
            t_cos = jnp.abs(jnp.sum(ng_f[a] * ng_f[b], -1))
            i_cos = jnp.abs(jnp.sum(np_f[a] * np_f[b], -1))
            rt = jnp.abs(jnp.sum(ng_f[r[0::2]] * ng_f[r[1::2]], -1))
            ri = jnp.abs(jnp.sum(np_f[r[0::2]] * np_f[r[1::2]], -1))
            return jnp.mean(jnp.abs(t_cos - i_cos)) + jnp.mean(jnp.abs(rt - ri))
        return jnp.sum(jax.vmap(per_image)(
            n_p, ng_all, a_all, b_all, r_all))

    def full(p, g, im):
        return jnp.sum(L.pwn_edge_loss(key, p, g, im, focal,
                                       n_anchors=n_anchors))

    slope(chain(normals_pred_only, False, gt), "normals(pred) fwd")
    slope(chain(normals_pred_only, True, gt), "normals(pred) fwd+grad")
    slope(chain(normals_both, False, gt), "normals(pred+gt) fwd")
    slope(chain(pairs_fn, False, rgb, n_g_const, gt),
          "edge maps + pair sampling fwd")
    slope(chain(gather_loss, False, gt, n_g_const, A_fix, B_fix, R_fix),
          "normals+gather+cos fwd")
    slope(chain(gather_loss, True, gt, n_g_const, A_fix, B_fix, R_fix),
          "normals+gather+cos fwd+grad")
    slope(chain(full, False, gt, rgb), "FULL pwn_edge fwd")
    slope(chain(full, True, gt, rgb), "FULL pwn_edge fwd+grad")


if __name__ == "__main__":
    main()
