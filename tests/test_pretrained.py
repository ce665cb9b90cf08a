"""Pretrained-backbone initialisation path (VERDICT r1 item 4).

The reference trains both towers from torchvision-pretrained ResNet18
(``network_mm/image_fe.py:19,33``).  Here ``init_state`` grafts converted
weights from a mounted dir / $AGPLACE_WEIGHTS / torchvision into the MM image
branch and every DBVanilla2D map-type branch, falling back to random init
when no source exists (zero-egress CI).
"""

import dataclasses

import numpy as np
import jax
import pytest

from agplace_tpu.config import synthetic_config
from agplace_tpu.utils.torch_convert import (
    _conv,
    find_pretrained_state_dict,
    load_pretrained_resnet,
)

from tests.test_models_image import _build_torch_resnet


def _cfg_batch(pretrained_path=None):
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64,
                           negs=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       pretrained_path=pretrained_path))
    ds = SyntheticDataset(n_db=8, n_q=4, image_size=32, n_points=64, seed=0)
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, ds)
    batch = collate_train(ds, miner.mine_random(rng, 2), cfg, rng)
    return cfg, batch


@pytest.mark.slow
def test_init_state_loads_weights_from_mounted_dir(tmp_path):
    import torch

    from agplace_tpu.train.step import init_state

    net = _build_torch_resnet("resnet18", 3)
    torch.save(net.state_dict(), tmp_path / "resnet18-rand.pth")

    cfg, batch = _cfg_batch(pretrained_path=str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)

    sd = net.state_dict()
    want_conv1 = _conv(sd["conv1.weight"].numpy())
    # MM image branch
    got = np.asarray(state.params["mm"]["image_fe"]["fe"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, want_conv1)
    # every DBVanilla2D map-type branch
    got_db = np.asarray(state.params["db"]["fe_0"]["fe"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got_db, want_conv1)
    # batch stats grafted too
    got_mean = np.asarray(
        state.batch_stats["mm"]["image_fe"]["fe"]["bn1"]["mean"])
    np.testing.assert_array_equal(got_mean, sd["bn1.running_mean"].numpy())
    # and training still steps
    from agplace_tpu.train.step import make_train_step

    st, m = make_train_step(cfg)(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_init_state_graceful_without_weights(tmp_path, monkeypatch):
    """pretrained=True but no weight source anywhere: random init, no crash."""
    from agplace_tpu.train.step import init_state

    monkeypatch.delenv("AGPLACE_WEIGHTS", raising=False)
    cfg, batch = _cfg_batch(pretrained_path=str(tmp_path / "nonexistent"))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    assert state is not None


def test_find_state_dict_search_order(tmp_path, monkeypatch):
    import torch

    net = _build_torch_resnet("resnet18", 3)
    d1 = tmp_path / "env_dir"
    d1.mkdir()
    torch.save(net.state_dict(), d1 / "resnet18-a.pth")
    monkeypatch.setenv("AGPLACE_WEIGHTS", str(d1))
    sd = find_pretrained_state_dict("resnet18")
    assert sd is not None and "conv1.weight" in sd
    # explicit file path wins
    sd2 = find_pretrained_state_dict("resnet18",
                                     path=str(d1 / "resnet18-a.pth"))
    assert sd2 is not None


def test_real_pretrained_forward_parity():
    """With a REAL torchvision checkpoint mounted (or torchvision installed
    with a populated cache), the converted forward must match torch.  Skips
    cleanly in zero-egress environments."""
    got = load_pretrained_resnet("resnet18", 3)
    if got is None:
        pytest.skip("no pretrained resnet18 source in this environment")
    try:
        import torchvision
    except ImportError:
        pytest.skip("torchvision not available for the oracle forward")
    # parity machinery identical to test_resnet_matches_torch_oracle
    import torch

    from agplace_tpu.models.resnet import ResNetFeatures

    params, stats = got
    tnet = torchvision.models.resnet18(weights="IMAGENET1K_V1").eval()
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        h = tnet.maxpool(torch.relu(tnet.bn1(tnet.conv1(xt))))
        for s in range(3):
            h = getattr(tnet, f"layer{s+1}")(h)
        want = h.numpy().transpose(0, 2, 3, 1)
    mod = ResNetFeatures(arch="resnet18", num_stages=3)
    out, _ = mod.apply({"params": params, "batch_stats": stats},
                       jax.numpy.asarray(x))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pretrained_reaches_geoloc_db_tower(tmp_path):
    """modeldb='geoloc': converted weights graft under the GeoDB wrapper's
    net/backbone (and share_qdb skips the absent db tower cleanly)."""
    import torch

    from agplace_tpu.train.step import init_state

    net = _build_torch_resnet("resnet18", 3)
    torch.save(net.state_dict(), tmp_path / "resnet18-rand.pth")

    cfg, batch = _cfg_batch(pretrained_path=str(tmp_path))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, modelq="geoloc", backbone="resnet18conv4",
            db=dataclasses.replace(cfg.model.db, modeldb="geoloc")))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    from agplace_tpu.utils.torch_convert import _conv

    want = _conv(net.state_dict()["conv1.weight"].numpy())
    got_q = np.asarray(state.params["mm"]["backbone"]["conv1"]["kernel"])
    got_db = np.asarray(
        state.params["db"]["net"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got_q, want)
    np.testing.assert_array_equal(got_db, want)

    # share_qdb: db tower absent, init still succeeds with pretrained on
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, share_qdb=True))
    state2 = init_state(cfg2, jax.random.PRNGKey(0), batch)
    assert state2.params["db"] == {}
