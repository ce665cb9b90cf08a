"""GeoLocalizationNet family tests (DVGLB ALT path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.models.geoloc import GeoLocalizationNet, backbone_output_dim
from agplace_tpu.models.pooling import CRN


@pytest.mark.parametrize("backbone,agg", [
    ("resnet18conv4", "gem"),
    ("resnet18conv5", "netvlad"),
    ("vgg16", "gem"),
    ("alexnet", "spoc"),
    ("vit", "cls"),
    ("vit", "gem"),
    ("cct384", "seqpool"),
    ("cct384", "gem"),
])
def test_geoloc_variants(backbone, agg):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
        jnp.float32)
    m = GeoLocalizationNet(backbone=backbone, aggregation=agg,
                           netvlad_clusters=4, trunc_te=2)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.ndim == 2 and out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_geoloc_fc_output_dim():
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)),
        jnp.float32)
    m = GeoLocalizationNet(backbone="resnet18conv4", aggregation="gem",
                           fc_output_dim=128)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, rtol=1e-5)


def test_crn_shape_and_norm():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 8, 32)),
        jnp.float32)
    m = CRN(clusters_num=8, dim=32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 8 * 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, rtol=1e-5)


def test_backbone_output_dims():
    assert backbone_output_dim("resnet18conv4") == 256
    assert backbone_output_dim("resnet50conv5") == 2048
    assert backbone_output_dim("vgg16") == 512
