"""Tests for the wider model families: AnyLoc ViT/VLAD, CCT, MinkLoc,
batch-hard metric losses, SDE/CDE integrators, PCA."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.models.anyloc import (
    DinoV2ExtractFeatures,
    VLAD,
    ViTExtractor,
    get_top_k_recall,
)
from agplace_tpu.models.cct import CCT
from agplace_tpu.models.minkloc import (
    ExtraBlock,
    MinkLoc,
    MinkLocMultimodal,
    ResnetFPN,
)
from agplace_tpu.ode.sde import cdeint, sdeint_euler
from agplace_tpu.train.metric_losses import (
    batch_hard_triplet_loss,
    masks_from_eastnorth,
    multi_batch_hard_triplet_loss,
)
from agplace_tpu.utils.pca import PCA, compute_pca, reduce_pca
from agplace_tpu.sparse.voxels import SparseVoxels


def _vox(rng, b=2, n=64, span=5):
    coords = np.zeros((b, n, 3), np.int32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        all_c = np.stack(np.meshgrid(*[np.arange(-span, span)] * 3,
                                     indexing="ij"), -1).reshape(-1, 3)
        take = rng.choice(len(all_c), size=n // 2, replace=False)
        coords[i, : n // 2] = all_c[take]
        mask[i, : n // 2] = True
    feats = np.where(mask[..., None], 1.0, 0.0).astype(np.float32)
    return SparseVoxels(coords=jnp.asarray(coords), feats=jnp.asarray(feats),
                        mask=jnp.asarray(mask), stride=1)


def test_vit_extractor_facets():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    for facet in ("token", "key", "query", "value"):
        m = ViTExtractor(hidden=64, depth=2, heads=4, patch=16, stride=16,
                         layer=1, facet=facet)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 4, 64), facet  # 2x2 patches
        assert np.isfinite(np.asarray(out)).all()


def test_vit_stride_patching_densifies():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    m = ViTExtractor(hidden=64, depth=1, heads=4, patch=16, stride=8,
                     layer=0, facet="token")
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 9, 64)  # 3x3 grid with stride 8


def test_vlad_hard_and_soft():
    rng = np.random.default_rng(2)
    # two clear clusters
    train = np.concatenate([rng.normal(5, 0.1, (50, 8)),
                            rng.normal(-5, 0.1, (50, 8))]).astype(np.float32)
    for mode in ("hard", "soft"):
        vlad = VLAD(num_clusters=2, vlad_mode=mode, norm_descs=False,
                    dist_mode="euclidean")
        vlad.fit(train)
        out = vlad.generate(train[:10])
        assert out.shape == (2 * 8,)
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-5)
    multi = vlad.generate_multi([train[:10], train[10:20]])
    assert multi.shape == (2, 16)


def test_vlad_fit_and_generate_and_cache(tmp_path):
    rng = np.random.default_rng(3)
    descs = [rng.normal(0, 1, (20, 8)).astype(np.float32) for _ in range(3)]
    vlad = VLAD(num_clusters=4, cache_dir=str(tmp_path))
    out = vlad.fit_and_generate(descs)
    assert out.shape == (3, 32)
    # restore vocabulary from cache
    vlad2 = VLAD(num_clusters=4, cache_dir=str(tmp_path))
    vlad2.fit(None)
    np.testing.assert_array_equal(vlad2.c_centers, vlad.c_centers)


def test_get_top_k_recall():
    rng = np.random.default_rng(4)
    db = rng.standard_normal((100, 16)).astype(np.float32)
    qu = db[:5] + 0.01 * rng.standard_normal((5, 16)).astype(np.float32)
    gt = [np.array([i]) for i in range(5)]
    _, idx, recalls = get_top_k_recall([1, 5], db, qu, gt, method="cosine")
    assert recalls[1] >= 0.8
    assert recalls[5] == 1.0


def test_cct_backbone():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    m = CCT(embed_dim=64, num_layers=2, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), x)
    tokens, pooled = m.apply(v, x)
    assert tokens.shape[0] == 2 and tokens.shape[-1] == 64
    assert pooled.shape == (2, 64)
    assert np.isfinite(np.asarray(pooled)).all()


@pytest.mark.slow
def test_minkloc_and_multimodal():
    rng = np.random.default_rng(6)
    vox = _vox(rng)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = MinkLocMultimodal(cloud_fe_size=32, image_fe_size=32, output_dim=64)
    v = m.init(jax.random.PRNGKey(0), vox, img)
    out = m.apply(v, vox, img)
    assert out["embedding"].shape == (2, 64)
    assert out["cloud_embedding"].shape == (2, 32)
    assert out["image_embedding"].shape == (2, 32)

    ml = MinkLoc(feature_size=32, output_dim=32, planes=(8, 16, 16),
                 num_top_down=1, linear_block=True)
    v2 = ml.init(jax.random.PRNGKey(0), vox)
    out2 = ml.apply(v2, vox)
    assert out2.shape == (2, 32)


def test_resnet_fpn_image():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    m = ResnetFPN(out_channels=64, lateral_dim=64, fh_num_bottom_up=3,
                  fh_num_top_down=1, add_fc_block=True)
    v = m.init(jax.random.PRNGKey(0), img)
    out = m.apply(v, img)
    assert out.shape == (2, 64)


def test_batch_hard_triplet_loss():
    rng = np.random.default_rng(8)
    en = np.array([[0, 0], [1, 0], [50, 0], [51, 0]], np.float64)
    pos, neg = masks_from_eastnorth(en, 10, 25)
    # embeddings where positives are close, negatives far: near-zero loss
    good = jnp.asarray([[0, 0], [0, 0.01], [5, 5], [5, 5.01]], jnp.float32)
    loss_good, stats = batch_hard_triplet_loss(good, jnp.asarray(pos),
                                               jnp.asarray(neg), margin=0.2)
    # random embeddings: larger loss
    bad = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
    loss_bad, _ = batch_hard_triplet_loss(bad, jnp.asarray(pos),
                                          jnp.asarray(neg), margin=0.2)
    assert float(loss_good) <= float(loss_bad) + 1e-6
    assert int(stats["num_triplets"]) == 4

    multi_loss, mstats = multi_batch_hard_triplet_loss(
        {"embedding": bad, "cloud_embedding": bad, "image_embedding": None},
        jnp.asarray(pos), jnp.asarray(neg), weights=(1.0, 0.5, 0.0))
    assert np.isfinite(float(multi_loss))


def test_sdeint_deterministic_limit():
    # sigma=0 reduces to the ODE; compare with euler odeint
    from agplace_tpu.ode.integrators import odeint_fixed

    w = jnp.eye(4) * 0.3
    mu = lambda y: jnp.tanh(y @ w)
    y = sdeint_euler(mu, lambda y: jnp.zeros_like(y), jnp.ones((4,)),
                     jax.random.PRNGKey(0), step_size=0.1)
    ref = odeint_fixed(lambda t, yy: mu(yy), jnp.ones((4,)), step_size=0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5)


def test_sdeint_noise_depends_on_key():
    mu = lambda y: -y
    sig = lambda y: jnp.ones_like(y) * 0.5
    y1 = sdeint_euler(mu, sig, jnp.ones((8,)), jax.random.PRNGKey(0))
    y2 = sdeint_euler(mu, sig, jnp.ones((8,)), jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_cdeint_linear_control():
    # f(z) = const matrix A: dz = A dX  =>  z1 = z0 + A (X_T - X_0)
    hid, ctrl = 3, 2
    a = jnp.asarray(np.random.default_rng(9).standard_normal((hid, ctrl)),
                    jnp.float32)
    func = lambda z: jnp.broadcast_to(a, z.shape[:-1] + (hid, ctrl))
    path = jnp.asarray(np.random.default_rng(10).standard_normal((5, ctrl)),
                       jnp.float32)
    z0 = jnp.zeros((hid,))
    z1 = cdeint(func, z0, path)
    expected = a @ (path[-1] - path[0])
    np.testing.assert_allclose(np.asarray(z1), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_pca_and_whitening():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((200, 16)) @ np.diag(np.linspace(5, 0.1, 16))
    pca = PCA(4, whiten=True).fit(x)
    y = pca.transform(x)
    assert y.shape == (200, 4)
    np.testing.assert_allclose(y.std(axis=0), 1.0, rtol=0.1)  # whitened
    tr, te = reduce_pca(x[:100], x[100:], 4)
    assert tr.shape == (100, 4) and te.shape == (100, 4)
    p2 = compute_pca(x, 4)
    assert p2.transform(x).shape == (200, 4)
