"""Torch differential oracles for the aggregation-head zoo (VERDICT r3
item 2): every descriptor-producing aggregation — GeM, SPoC, MAC, RMAC,
ConvAP, CosPlace, MixVPR, RRM, NetVLAD (incl. the k-means init), CRN, and
the AnyLoc VLAD (hard + soft assignment) — is mirrored in raw torch from
the reference math (``model/aggregation.py:85-259``,
``model/functional.py:43-83``, ``network/image_pooling.py:23-152``,
``anyloc/utilities.py:630-1016``), driven with IDENTICAL weights and
inputs, and required to agree on the descriptor AND on every gradient
(input + all parameter leaves) at fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from agplace_tpu.models.pooling import (  # noqa: E402
    GlobalHead, NetVLAD, rmac_regions)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


def _t(w):  # torch leaf with grad
    t = torch.from_numpy(np.asarray(w, np.float32)).clone()
    t.requires_grad_(True)
    return t


def _conv(x, w_hwio, b=None, stride=1, padding=0):
    return F.conv2d(x, w_hwio.permute(3, 2, 0, 1), b, stride=stride,
                    padding=padding)


def _l2t(x, dim=-1):
    return F.normalize(x, p=2, dim=dim)


# ---------------------------------------------------------------------------
# torch mirrors of the reference aggregations, consuming {flax-path: tensor}
# ---------------------------------------------------------------------------


def _gem_t(x, p, eps=1e-6):  # x [b,c,h,w] -> [b,c]  (functional.py:34-40)
    return F.avg_pool2d(x.clamp(min=eps).pow(p),
                        (x.size(-2), x.size(-1))).pow(1.0 / p)[:, :, 0, 0]


def _rmac_t(x, levels=3, eps=1e-6):  # functional.py:43-83
    b, c, h, w = x.shape
    v = F.max_pool2d(x, (h, w))[:, :, 0, 0]
    v = v / (torch.norm(v, p=2, dim=1, keepdim=True) + eps)
    for i0, j0, wl in rmac_regions(h, w, levels):
        r = x[:, :, i0 : i0 + wl, j0 : j0 + wl]
        vt = F.max_pool2d(r, (wl, wl))[:, :, 0, 0]
        vt = vt / (torch.norm(vt, p=2, dim=1, keepdim=True) + eps)
        v = v + vt
    return v


def _netvlad_t(x, W, root, mask=None):
    """model/aggregation.py:126-146 (CRN reweighting when mask given),
    literal per-cluster residual loop."""
    n, d = x.shape[0], x.shape[1]
    centroids = W[f"{root}/centroids"]
    k = centroids.shape[0]
    x = _l2t(x, dim=1)  # across descriptor dim
    x_flat = x.reshape(n, d, -1)
    # bias-free 1x1 soft-assign conv: assign_w is [C, K] (flax dot layout)
    soft = torch.einsum("cK,bcn->bKn", W[f"{root}/assign_w"], x_flat)
    soft = F.softmax(soft, dim=1)
    if mask is not None:
        soft = soft * mask.reshape(n, 1, -1)
    vlad = []
    for ki in range(k):  # the reference's memory-saving loop
        residual = x_flat.permute(0, 2, 1) - centroids[ki]
        residual = residual * soft[:, ki].unsqueeze(-1)
        vlad.append(residual.sum(dim=1))
    vlad = torch.stack(vlad, dim=1)  # [n, k, d]
    vlad = _l2t(vlad, dim=2)
    vlad = vlad.reshape(n, -1)
    return _l2t(vlad, dim=1)


def _crn_mask_t(x, W, root):
    """CRNModule (aggregation.py:179-231): ceil-mode avgpool downsample,
    3/5/7 context filters, fixed-ones accumulation, bilinear 2x upsample."""
    xd = F.avg_pool2d(x, 3, stride=2, padding=0, ceil_mode=True)
    g3 = _conv(xd, W[f"{root}/filter_3/kernel"], W[f"{root}/filter_3/bias"],
               padding=1)
    g5 = _conv(xd, W[f"{root}/filter_5/kernel"], W[f"{root}/filter_5/bias"],
               padding=2)
    g7 = _conv(xd, W[f"{root}/filter_7/kernel"], W[f"{root}/filter_7/bias"],
               padding=3)
    g = F.relu(torch.cat([g3, g5, g7], dim=1))
    wmask = F.relu(g.sum(dim=1, keepdim=True))  # acc_w: fixed ones, bias 0
    return F.interpolate(wmask, scale_factor=2, mode="bilinear")


def _mirror(agg, x, W):
    """x: [b, c, h, w] torch; W: {path: torch tensor}.  Returns [b, out]."""
    if agg == "gem":
        return _gem_t(x, W["gem/p"])
    if agg == "spoc":
        return F.adaptive_avg_pool2d(x, (1, 1))[:, :, 0, 0]
    if agg == "mac":
        return F.adaptive_max_pool2d(x, (1, 1))[:, :, 0, 0]
    if agg == "rmac":
        return _rmac_t(x)
    if agg == "convap":  # network/image_pooling.py:21-39
        y = _conv(x, W["convap/Conv_0/kernel"], W["convap/Conv_0/bias"])
        y = F.adaptive_avg_pool2d(y, (2, 2))
        return _l2t(y.flatten(1), dim=1)
    if agg == "cosplace":  # network/image_pooling.py:42-61
        y = _l2t(x, dim=1)
        v = _gem_t(y, W["cosplace/gem/p"])
        v = v @ W["cosplace/fc/kernel"] + W["cosplace/fc/bias"]
        return _l2t(v, dim=1)
    if agg == "mixvpr":  # network/image_pooling.py:66-124
        b = x.shape[0]
        y = x.flatten(2)  # [b, c, hw]
        i = 0
        while f"mixvpr/mix_{i}/LayerNorm_0/scale" in W:
            r = f"mixvpr/mix_{i}"
            z = F.layer_norm(y, y.shape[-1:], W[f"{r}/LayerNorm_0/scale"],
                             W[f"{r}/LayerNorm_0/bias"])
            z = z @ W[f"{r}/Dense_0/kernel"] + W[f"{r}/Dense_0/bias"]
            z = F.relu(z)
            z = z @ W[f"{r}/Dense_1/kernel"] + W[f"{r}/Dense_1/bias"]
            y = y + z
            i += 1
        y = y.permute(0, 2, 1)
        y = y @ W["mixvpr/channel_proj/kernel"] + W["mixvpr/channel_proj/bias"]
        y = y.permute(0, 2, 1)
        y = y @ W["mixvpr/row_proj/kernel"] + W["mixvpr/row_proj/bias"]
        return _l2t(y.flatten(1), dim=-1)
    if agg == "rrm":  # model/aggregation.py:57-81 (with the final L2)
        v = F.adaptive_avg_pool2d(x, 1)[:, :, 0, 0]
        v = F.layer_norm(v, v.shape[-1:], W["rrm/ln1/scale"],
                         W["rrm/ln1/bias"])
        h = F.relu(v @ W["rrm/fc1/kernel"] + W["rrm/fc1/bias"])
        h = h @ W["rrm/fc2/kernel"] + W["rrm/fc2/bias"]
        out = F.layer_norm(v + h, v.shape[-1:], W["rrm/ln2/scale"],
                           W["rrm/ln2/bias"])
        return _l2t(out, dim=1)
    if agg == "netvlad":
        return _netvlad_t(x, W, "netvlad")
    if agg == "crn":  # CRN.forward (aggregation.py:236-259)
        xn = _l2t(x, dim=1)
        mask = _crn_mask_t(xn, W, "crn")
        return _netvlad_t(x, W, "crn", mask=mask)
    raise NotImplementedError(agg)


AGGS = ["gem", "spoc", "mac", "rmac", "convap", "cosplace", "mixvpr",
        "rrm", "netvlad", "crn"]


@pytest.mark.parametrize("agg", AGGS)
def test_aggregation_matches_torch(agg):
    rng = np.random.default_rng(hash(agg) % 2**31)
    b, h, w, c = 2, 8, 8, 64
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)

    head = GlobalHead(agg, features_dim=c, netvlad_clusters=8)
    vs = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomise params so zero-init biases etc. are actually checked
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape) * (0.2 if a.ndim > 0 else 1) + (
                1.0 if a.ndim == 1 and a.shape[0] == 1 else 0.0),
            a.dtype), vs.get("params", {}))
    vs = {"params": params}

    probe = rng.standard_normal(
        np.asarray(head.apply(vs, jnp.asarray(x))).shape[-1:]).astype(
            np.float32)

    def jax_loss(p, xin):
        out = head.apply({"params": p}, xin)
        return jnp.sum(out * jnp.asarray(probe)), out

    (jl, jout), (gp, gx) = jax.value_and_grad(
        jax_loss, argnums=(0, 1), has_aux=True)(params, jnp.asarray(x))

    W = {k: _t(v) for k, v in _flatten(params).items()}
    xt = _t(np.transpose(x, (0, 3, 1, 2)))
    tout = _mirror(agg, xt, W)
    tl = (tout * torch.from_numpy(probe)).sum()
    tl.backward()

    np.testing.assert_allclose(np.asarray(jout), tout.detach().numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.numpy().transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-5)
    for k, g in _flatten(gp).items():
        assert W[k].grad is not None, k
        np.testing.assert_allclose(g, W[k].grad.numpy(), rtol=2e-3,
                                   atol=2e-5, err_msg=k)


def test_netvlad_kmeans_init_matches_reference():
    """init_from_kmeans == the reference init_params math
    (aggregation.py:112-125): alpha from top-2 centroid-descriptor dots,
    assign weight = alpha * L2-normalized centroids, no bias."""
    rng = np.random.default_rng(7)
    k, d, n = 8, 16, 200
    centroids = rng.standard_normal((k, d)).astype(np.float32)
    descs = rng.standard_normal((n, d)).astype(np.float32)

    head = NetVLAD(clusters_num=k, dim=d)
    vs = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, d)))
    newp = NetVLAD.init_from_kmeans(dict(vs["params"]), centroids,
                                    descriptors=descs)

    # reference math, verbatim semantics
    ca = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    dots = np.sort(ca @ descs.T, axis=0)[::-1]
    alpha = (-np.log(0.01) / np.mean(dots[0, :] - dots[1, :]))
    np.testing.assert_allclose(np.asarray(newp["centroids"]), centroids)
    np.testing.assert_allclose(np.asarray(newp["assign_w"]),
                               (alpha * ca).T, rtol=1e-6)
    assert "assign_b" not in newp  # reference conv has bias=None


@pytest.mark.parametrize("vlad_mode", ["hard", "soft"])
@pytest.mark.parametrize("dist_mode", ["cosine", "euclidean"])
def test_anyloc_vlad_matches_torch(vlad_mode, dist_mode):
    """AnyLoc VLAD.generate == a literal torch mirror of
    anyloc/utilities.py:824-923 (incl. the raw-descriptor hard predict and
    the soft branch's (q c) residual-sum quirk), given fixed centers."""
    from agplace_tpu.models.anyloc import VLAD

    rng = np.random.default_rng(11)
    n, k, d = 40, 6, 12
    descs = rng.standard_normal((n, d)).astype(np.float32) * 2.0
    centers = rng.standard_normal((k, d)).astype(np.float32)

    v = VLAD(num_clusters=k, desc_dim=d, vlad_mode=vlad_mode,
             dist_mode=dist_mode, soft_temp=1.3)
    v.c_centers = centers
    ours = v.generate(descs)

    # torch mirror
    q = torch.from_numpy(descs)
    cc = torch.from_numpy(centers)
    qn = _l2t(q, dim=1)
    residuals = qn.unsqueeze(1) - cc.unsqueeze(0)  # [q, c, d]
    un_vlad = torch.zeros(k * d)
    if vlad_mode == "hard":
        if dist_mode == "cosine":
            labels = (_l2t(q, dim=1) @ _l2t(cc, dim=1).T).argmax(dim=1)
        else:  # fpk euclidean predict: nearest center to the RAW descs
            labels = ((q.unsqueeze(1) - cc.unsqueeze(0)) ** 2).sum(
                -1).argmin(dim=1)
        for ki in set(labels.numpy().tolist()):
            cd = residuals[labels == ki, ki].sum(dim=0)
            cd = F.normalize(cd, dim=0)
            un_vlad[ki * d : (ki + 1) * d] = cd
    else:
        cos = F.cosine_similarity(q.unsqueeze(1), cc.unsqueeze(0), dim=2)
        soft = F.softmax(1.3 * cos, dim=1)
        for ki in range(k):
            wgt = soft[:, ki].reshape(-1, 1, 1)
            cd = (wgt * residuals).reshape(-1, d).sum(dim=0)  # (q c) quirk
            cd = F.normalize(cd, dim=0)
            un_vlad[ki * d : (ki + 1) * d] = cd
    ref = F.normalize(un_vlad, dim=0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
