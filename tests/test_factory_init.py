"""Model factory, NetVLAD dataset init, nuScenes sequence tokens."""

import numpy as np
import jax
import jax.numpy as jnp

from agplace_tpu.config import synthetic_config
from agplace_tpu.data.nuscenes import get_seq_sample_tokens
from agplace_tpu.models.factory import make_db_model, make_query_model


def test_factory_builds_all_query_models():
    import dataclasses

    cfg = synthetic_config(image_size=32, vox_max_points=64)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    mm = make_query_model(cfg)
    assert type(mm).__name__ == "MM"

    cfg_g = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modelq="geoloc"))
    g = make_query_model(cfg_g)
    v = g.init(jax.random.PRNGKey(0), img)
    out = g.apply(v, img)
    assert out.shape[0] == 2

    db = make_db_model(cfg)
    assert type(db).__name__ == "DBVanilla2D"


def test_netvlad_initialize_from_dataset():
    from agplace_tpu.models.geoloc import GeoLocalizationNet
    from agplace_tpu.train.netvlad_init import initialize_netvlad

    rng = np.random.default_rng(1)
    model = GeoLocalizationNet(backbone="resnet18conv4",
                               aggregation="netvlad", netvlad_clusters=4)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)

    # backbone feature maps via the same model truncated at the backbone
    from agplace_tpu.models.resnet import ResNetFeatures

    bb = ResNetFeatures(arch="resnet18", num_stages=3)

    def backbone_apply(images):
        out, _ = bb.apply(
            {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]},
            jnp.asarray(images))
        return out

    sample = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    new_vars = initialize_netvlad(variables, backbone_apply, sample,
                                  clusters_num=4)
    old_c = np.asarray(variables["params"]["aggregation"]["netvlad"]
                       ["centroids"])
    new_c = np.asarray(new_vars["params"]["aggregation"]["netvlad"]
                       ["centroids"])
    assert not np.allclose(old_c, new_c)
    # model still runs with the initialised params
    out = model.apply(new_vars, img)
    assert np.isfinite(np.asarray(out)).all()
    # assign conv consistent with centroids (reference init_params,
    # model/aggregation.py:112-125): w = alpha * L2-normalized centroids
    # with ONE positive alpha from the descriptor statistics, no bias
    w = np.asarray(new_vars["params"]["aggregation"]["netvlad"]["assign_w"])
    cn = new_c / np.linalg.norm(new_c, axis=1, keepdims=True)
    sel = np.abs(cn) > 1e-6  # zero components give no alpha estimate
    alphas = w.T[sel] / cn[sel]  # every entry must agree on alpha
    alpha = alphas.flat[0]
    assert alpha > 0
    np.testing.assert_allclose(alphas, alpha, rtol=1e-4)
    assert "assign_b" not in new_vars["params"]["aggregation"]["netvlad"]


def test_seq_sample_tokens():
    q = {
        "a": {"prev": "", "next": "b"},
        "b": {"prev": "a", "next": "c"},
        "c": {"prev": "b", "next": ""},
    }
    assert get_seq_sample_tokens(q, "c", 3, "new") == ["a", "b", "c"]
    assert get_seq_sample_tokens(q, "a", 3, "old") == ["a", "b", "c"]
    assert get_seq_sample_tokens(q, "b", 3, "mid") == ["a", "b", "c"]
    # saturation at scene boundary
    assert get_seq_sample_tokens(q, "a", 3, "new") == ["a", "a", "a"]
