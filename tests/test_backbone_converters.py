"""Weight-converter oracles for the non-ResNet backbones (VERDICT r2
item 1 / missing #1): build each torch reference trunk in-test with
torchvision-identical module naming (torchvision itself is not installed;
torch-CPU is), convert its random-init state_dict, and require numerical
agreement between the torch forward and our flax forward.

Reference truncations under test:
* vgg16 / alexnet: ``features.children()[:-2]`` (model/network.py:144,149)
* convnext_tiny: stage-clipped per ``layers`` (network_mm/image_fe.py:59-88)
* squeezenet1_0/1_1 trunks + fresh 1x1 head (network_mm/image_fe.py:43-49)
* ViT-B/16: the HF ViTModel itself is the oracle (model/network.py:170-191)
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from agplace_tpu.utils.torch_convert import (  # noqa: E402
    convert_alexnet,
    convert_convnext_tiny,
    convert_squeezenet,
    convert_vgg16,
    convert_vit_b16,
)


def _nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _rand_img(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


# ---------------------------------------------------------------------- vgg16
def _torch_vgg16_trunk():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    mods, cin = [], 3
    for v in cfg:
        if v == "M":
            mods.append(tnn.MaxPool2d(2, 2))
        else:
            mods.append(tnn.Conv2d(cin, v, 3, padding=1))
            mods.append(tnn.ReLU(inplace=False))
            cin = v
    feats = tnn.Sequential(*mods)  # indices match torchvision.features
    return tnn.Sequential(*list(feats.children())[:-1]), feats
    # [:-1] here == torchvision's features[:-2] (we never append the pool)


def test_vgg16_converter_matches_torch():
    trunk, feats = _torch_vgg16_trunk()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params, _ = convert_vgg16(sd)

    from agplace_tpu.models.geoloc import VGG16Features

    x = _rand_img((2, 3, 64, 64))
    with torch.no_grad():
        want = trunk(torch.from_numpy(x)).numpy()
    got = VGG16Features().apply({"params": params},
                                jax.numpy.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want),
                               rtol=2e-4, atol=2e-4)


# -------------------------------------------------------------------- alexnet
def _torch_alexnet_trunk():
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )
    return tnn.Sequential(*list(feats.children())[:-2]), feats


def test_alexnet_converter_matches_torch():
    trunk, feats = _torch_alexnet_trunk()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params, _ = convert_alexnet(sd)

    from agplace_tpu.models.geoloc import AlexNetFeatures

    x = _rand_img((2, 3, 67, 67), seed=1)  # odd size exercises padding
    with torch.no_grad():
        want = trunk(torch.from_numpy(x)).numpy()
    got = AlexNetFeatures().apply({"params": params},
                                  jax.numpy.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- convnext
class _TorchCNBlock(tnn.Module):
    """torchvision.models.convnext.CNBlock with identical param names."""

    def __init__(self, dim):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(dim, dim, 7, padding=3, groups=dim),  # 0
            tnn.Identity(),                                  # 1 permute
            tnn.LayerNorm(dim),                              # 2
            tnn.Linear(dim, 4 * dim),                        # 3
            tnn.GELU(),                                      # 4
            tnn.Linear(4 * dim, dim),                        # 5
        )
        self.layer_scale = tnn.Parameter(torch.ones(dim, 1, 1) * 1e-6)

    def forward(self, x):
        y = self.block[0](x).permute(0, 2, 3, 1)
        y = self.block[2](y)
        y = self.block[5](torch.nn.functional.gelu(self.block[3](y)))
        y = y.permute(0, 3, 1, 2)
        return x + self.layer_scale * y


class _TorchLN2d(tnn.LayerNorm):
    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


def _torch_convnext(layers=(2, 2, 2)):
    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    feats = tnn.ModuleDict()
    feats["0"] = tnn.Sequential(tnn.Conv2d(3, dims[0], 4, stride=4),
                                _TorchLN2d(dims[0]))
    for s in range(len(layers)):
        if s > 0:
            feats[str(2 * s)] = tnn.Sequential(
                _TorchLN2d(dims[s - 1]),
                tnn.Conv2d(dims[s - 1], dims[s], 2, stride=2))
        feats[str(2 * s + 1)] = tnn.Sequential(*[
            _TorchCNBlock(dims[s])
            for _ in range(min(layers[s], depths[s]))])
    return feats


def test_convnext_converter_matches_torch():
    layers = (2, 2, 2)
    feats = _torch_convnext(layers)
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params, _ = convert_convnext_tiny(sd, layers)

    from agplace_tpu.models.image_fe import ConvNeXtTinyFeatures

    x = _rand_img((2, 3, 64, 64), seed=2)
    with torch.no_grad():
        t = torch.from_numpy(x)
        maps = []
        for i in range(2 * len(layers)):
            t = feats[str(i)](t)
            if i % 2 == 1:
                maps.append(t.numpy())
    got_last, got_maps = ConvNeXtTinyFeatures(layers=layers).apply(
        {"params": params}, jax.numpy.asarray(_nhwc(x)))
    assert len(got_maps) == len(maps)
    for g, w in zip(got_maps, maps):
        np.testing.assert_allclose(np.asarray(g), _nhwc(w),
                                   rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------- squeezenet
class _TorchFire(tnn.Module):
    def __init__(self, cin, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, s, 1)
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)

    def forward(self, x):
        x = torch.relu(self.squeeze(x))
        return torch.cat([torch.relu(self.expand1x1(x)),
                          torch.relu(self.expand3x3(x))], 1)


def _torch_squeezenet(version):
    if version == "1_0":
        feats = tnn.Sequential(
            tnn.Conv2d(3, 96, 7, stride=2), tnn.ReLU(),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(96, 16, 64), _TorchFire(128, 16, 64),
            _TorchFire(128, 32, 128),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(256, 32, 128), _TorchFire(256, 48, 192),
            _TorchFire(384, 48, 192), _TorchFire(384, 64, 256),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(512, 64, 256),
        )
    else:
        feats = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, stride=2), tnn.ReLU(),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(64, 16, 64), _TorchFire(128, 16, 64),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(128, 32, 128), _TorchFire(256, 32, 128),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(256, 48, 192), _TorchFire(384, 48, 192),
            _TorchFire(384, 64, 256), _TorchFire(512, 64, 256),
        )
    return feats


@pytest.mark.parametrize("version", ["1_0", "1_1"])
def test_squeezenet_converter_matches_torch(version):
    feats = _torch_squeezenet(version)
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params, _ = convert_squeezenet(sd, version)

    from agplace_tpu.models.image_fe import SqueezeNetFeatures

    fe = SqueezeNetFeatures(version=version)
    x = _rand_img((2, 3, 65, 65), seed=3)  # odd: exercises VALID+ceil pool
    with torch.no_grad():
        want = feats(torch.from_numpy(x)).numpy()
    # init to materialise the fresh fc head, then graft the trunk
    variables = fe.init(jax.random.PRNGKey(0), jax.numpy.asarray(_nhwc(x)))
    merged = dict(variables["params"])
    merged.update({k: v for k, v in params.items()})
    got_last, got_maps = fe.apply({"params": merged},
                                  jax.numpy.asarray(_nhwc(x)))
    # the module's final output is trunk -> fresh 1x1 fc head; push torch's
    # trunk output through the SAME fc weights and compare end-to-end
    fc_k = merged["fc"]["kernel"]
    fc_b = merged["fc"]["bias"]
    want_fc = _nhwc(want) @ np.asarray(fc_k)[0, 0] + np.asarray(fc_b)
    np.testing.assert_allclose(np.asarray(got_last), want_fc,
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------- vit
def test_vit_converter_matches_hf_transformers():
    transformers = pytest.importorskip("transformers")
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=256,
                       image_size=32, patch_size=8,
                       hidden_act="gelu",  # HF default ln eps 1e-12 matches
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    params, _ = convert_vit_b16(hf.state_dict(), heads=4)

    from agplace_tpu.models.geoloc import ViTBackbone

    x = _rand_img((2, 3, 32, 32), seed=4)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    vb = ViTBackbone(hidden=64, layers=2, heads=4, patch=8)
    got = vb.apply({"params": params}, jax.numpy.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("facet,use_cls", [("token", False),
                                           ("query", False),
                                           ("key", True),
                                           ("value", False)])
def test_cosplace_vit_extractor_matches_hf_hooks(facet, use_cls):
    """CosPlaceViTExtractFeatures (anyloc/utilities.py:134-211) vs the
    reference mechanism itself: forward hooks on an HF ViTModel's
    encoder.layer[i] / attention.attention.{query,key,value}."""
    pytest.importorskip("transformers")
    from transformers import ViTConfig, ViTModel

    layer = 1
    hf_cfg = ViTConfig(hidden_size=64, num_hidden_layers=3,
                       num_attention_heads=4, intermediate_size=256,
                       image_size=32, patch_size=8,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    hook_out = {}

    def _hook(module, inputs, output):
        # the reference indexes output[0] for the token facet
        # (utilities.py:188, a 1-tuple in its transformers version); newer
        # ViTLayer returns the tensor bare
        if facet == "token" and isinstance(output, tuple):
            output = output[0]
        hook_out["t"] = output

    if facet == "token":
        h = hf.encoder.layer[layer].register_forward_hook(_hook)
    else:
        h = getattr(hf.encoder.layer[layer].attention.attention,
                    facet).register_forward_hook(_hook)
    x = _rand_img((2, 3, 32, 32), seed=7)
    with torch.no_grad():
        hf(torch.from_numpy(x))
    h.remove()
    want = hook_out["t"]
    if not use_cls:
        want = want[:, 1:]
    want = torch.nn.functional.normalize(want, dim=-1).numpy()

    from agplace_tpu.models.anyloc import CosPlaceViTExtractFeatures

    params, _ = convert_vit_b16(hf.state_dict(), heads=4)
    ex = CosPlaceViTExtractFeatures(hidden=64, heads=4, patch=8,
                                    layer=layer, facet=facet,
                                    use_cls=use_cls, norm_descs=True)
    got = ex.apply({"params": params}, jax.numpy.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_mae_sincos_pos_embed():
    """MAE 2D sincos helpers (anyloc/utilities.py:315-391): reference
    formulation checked value-by-value."""
    from agplace_tpu.models.anyloc import (
        get_1d_sincos_pos_embed_from_grid, get_2d_sincos_pos_embed,
        interpolate_pos_embed)

    # 1D: sin(pos*omega) | cos(pos*omega), omega = 10000^(-2i/d)
    pe = get_1d_sincos_pos_embed_from_grid(8, np.array([0.0, 1.0, 3.0]))
    assert pe.shape == (3, 8)
    np.testing.assert_allclose(pe[0], [0, 0, 0, 0, 1, 1, 1, 1], atol=1e-12)
    omega = 1.0 / 10000 ** (np.arange(4) / 4.0)
    np.testing.assert_allclose(pe[2, :4], np.sin(3 * omega), rtol=1e-12)
    np.testing.assert_allclose(pe[2, 4:], np.cos(3 * omega), rtol=1e-12)

    # 2D: zero CLS row; the reference feeds meshgrid's w-array into the
    # FIRST half (its `emb_h` name notwithstanding, utilities.py:323,337)
    # so along a column (fixed w) the first half is constant, and along a
    # row (fixed h) the second half is constant.  [h, w] indexing.
    pe2 = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    assert pe2.shape == (17, 16)
    np.testing.assert_allclose(pe2[0], 0, atol=1e-12)
    grid = pe2[1:].reshape(4, 4, 16)
    np.testing.assert_allclose(grid[0, 1, :8], grid[3, 1, :8], atol=1e-12)
    np.testing.assert_allclose(grid[2, 0, 8:], grid[2, 3, 8:], atol=1e-12)
    # and the w-half actually varies with w / the h-half with h
    assert np.abs(grid[2, 0, :8] - grid[2, 3, :8]).max() > 0.1
    assert np.abs(grid[0, 1, 8:] - grid[3, 1, 8:]).max() > 0.1

    # interpolate: identity at the same geometry, bicubic grid otherwise
    pos = np.random.default_rng(0).standard_normal((1, 17, 8)).astype(
        np.float32)
    np.testing.assert_allclose(interpolate_pos_embed(pos, 16), pos)
    up = interpolate_pos_embed(pos, 64)
    assert up.shape == (1, 65, 8)
    np.testing.assert_allclose(up[:, :1], pos[:, :1])  # CLS untouched


def test_vit_pos_embed_resize_roundtrip():
    """Grid-resize to the checkpoint's own geometry is the identity."""
    from agplace_tpu.utils.torch_convert import _resize_pos_embed

    pos = np.random.default_rng(0).standard_normal((1, 17, 8)).astype(
        np.float32)
    same = _resize_pos_embed(pos, 16)
    np.testing.assert_allclose(same, pos, rtol=1e-5, atol=1e-6)
    up = _resize_pos_embed(pos, 64)
    assert up.shape == (1, 65, 8)


# ------------------------------------------------------- end-to-end grafting
def test_apply_pretrained_backbones_from_mounted_weights(tmp_path,
                                                         monkeypatch):
    """Drop torchvision-format .pth files in $AGPLACE_WEIGHTS and
    ``--pretrained true`` grafts them into the towers — the workflow
    ``scripts/fetch_weights.py`` documents.  Uses the in-test torch mirrors
    as weight factories; asserts the grafted leaves equal the converted
    tensors and that fresh heads (squeezenet fc) stay random."""
    import dataclasses

    import jax as _jax
    import numpy as _np

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state

    # weights dir with a squeezenet trunk
    feats = _torch_squeezenet("1_1")
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    torch.save(sd, tmp_path / "squeezenet11.pth")
    monkeypatch.setenv("AGPLACE_WEIGHTS", str(tmp_path))

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64,
                           negs=2)
    db = dataclasses.replace(cfg.model.db, image_fe="squeezenet11")
    model = dataclasses.replace(cfg.model, db=db, pretrained=True)
    cfg = dataclasses.replace(cfg, model=model)
    ds = SyntheticDataset(n_db=6, n_q=4, image_size=32, n_points=64, seed=0)
    rng = np.random.default_rng(0)
    batch = collate_train(ds, TripletMiner(cfg, ds).mine_random(rng, 2),
                          cfg, rng)
    state = init_state(cfg, _jax.random.PRNGKey(0), batch)

    want, _ = convert_squeezenet(sd, "1_1")
    got = state.params["db"]["fe_0"]["fe"]
    _np.testing.assert_allclose(
        _np.asarray(got["conv0"]["kernel"]), want["conv0"]["kernel"],
        rtol=1e-6)
    _np.testing.assert_allclose(
        _np.asarray(got["fire5"]["expand3"]["kernel"]),
        want["fire5"]["expand3"]["kernel"], rtol=1e-6)
    assert "fc" in got  # fresh head still present (not grafted)
    # the MM tower's resnet stays random-init (no resnet18.pth mounted)
    assert "image_fe" in state.params["mm"]


# --------------------------------------------------------------------- cct
class _TorchCCTAttention(tnn.Module):
    """transformers.py:7-34 Attention: fused no-bias qkv + proj."""

    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TorchCCTLayer(tnn.Module):
    """transformers.py:73-99 TransformerEncoderLayer (eval, no dropout)."""

    def __init__(self, dim, heads, ff):
        super().__init__()
        self.pre_norm = tnn.LayerNorm(dim)
        self.self_attn = _TorchCCTAttention(dim, heads)
        self.linear1 = tnn.Linear(dim, ff)
        self.norm1 = tnn.LayerNorm(dim)
        self.linear2 = tnn.Linear(ff, dim)

    def forward(self, src):
        src = src + self.self_attn(self.pre_norm(src))
        src = self.norm1(src)
        src2 = self.linear2(torch.nn.functional.gelu(self.linear1(src)))
        return src + src2


class _TorchCCT(tnn.Module):
    """cct_14_7x2-shaped mirror with checkpoint-identical key names."""

    def __init__(self, dim=64, heads=4, layers=2, mlp_ratio=3.0,
                 n_tokens=16):
        super().__init__()

        class Tok(tnn.Module):
            def __init__(self):
                super().__init__()
                # reference n_filter_list = [3, in_planes=64, embed_dim]
                # (tokenizer.py:13,19-21) — intermediate width is 64
                # regardless of embed_dim
                self.conv_layers = tnn.Sequential(
                    tnn.Sequential(tnn.Conv2d(3, 64, 7, 2, 3,
                                              bias=False), tnn.ReLU(),
                                   tnn.MaxPool2d(3, 2, 1)),
                    tnn.Sequential(tnn.Conv2d(64, dim, 7, 2, 3,
                                              bias=False), tnn.ReLU(),
                                   tnn.MaxPool2d(3, 2, 1)),
                )

            def forward(self, x):
                return self.conv_layers(x).flatten(2, 3).transpose(-2, -1)

        class Clf(tnn.Module):
            def __init__(self):
                super().__init__()
                self.positional_emb = tnn.Parameter(
                    torch.randn(1, n_tokens, dim) * 0.2)
                self.blocks = tnn.ModuleList([
                    _TorchCCTLayer(dim, heads, int(dim * mlp_ratio))
                    for _ in range(layers)])
                self.norm = tnn.LayerNorm(dim)
                self.attention_pool = tnn.Linear(dim, 1)

            def forward(self, x):
                x = x + self.positional_emb
                for blk in self.blocks:
                    x = blk(x)
                x = self.norm(x)
                w = torch.softmax(self.attention_pool(x), dim=1)
                return x, (w.transpose(-2, -1) @ x).squeeze(-2)

        self.tokenizer = Tok()
        self.classifier = Clf()

    def forward(self, x):
        return self.classifier(self.tokenizer(x))


def test_cct_converter_matches_torch():
    from agplace_tpu.models.cct import CCT
    from agplace_tpu.utils.torch_convert import convert_cct

    dim, heads, layers = 96, 4, 2  # dim != 64 separates embed/in_planes
    x = _rand_img((2, 3, 64, 64), seed=7)  # tokenizer /16 -> 4x4=16 tokens
    tc = _TorchCCT(dim, heads, layers, n_tokens=16).eval()
    with torch.no_grad():
        want_tokens, want_pooled = tc(torch.from_numpy(x))
    params, _ = convert_cct(tc.state_dict())

    m = CCT(embed_dim=dim, num_layers=layers, num_heads=heads,
            mlp_ratio=3.0)
    got_tokens, got_pooled = m.apply({"params": params},
                                     jax.numpy.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got_tokens),
                               want_tokens.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_pooled),
                               want_pooled.numpy(), rtol=2e-3, atol=2e-3)

    # the flax init tree must match the converted tree leaf-for-leaf
    # (shape included) or real-checkpoint grafts/restores shape-mismatch —
    # the tokenizer's 3->64->embed_dim schedule was wrong before (a
    # halving ladder), which apply()-based parity alone cannot catch
    tmpl = m.init(jax.random.PRNGKey(0),
                  jax.numpy.asarray(_nhwc(x)))["params"]
    t1 = jax.tree_util.tree_map(lambda a: a.shape, tmpl)
    t2 = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert t1 == t2


def test_cct_pos_embed_grid_resize():
    from agplace_tpu.utils.torch_convert import convert_cct

    tc = _TorchCCT(64, 4, 1, n_tokens=16).eval()
    params, _ = convert_cct(tc.state_dict(), n_tokens=64)
    assert params["pos"].shape == (1, 64, 64)


def test_graft_preserves_template_structure_past_trunc():
    """Structure-preserving graft (merge_pretrained_subtree): converting a
    4-layer ViT checkpoint into a trunc_te=2 backbone must keep the model
    template's tree exactly (no dead encoder layers in params/optimizer/
    checkpoints) while grafting the layers the model does use; a leaf
    shape mismatch raises instead of silently poisoning the tree."""
    transformers = pytest.importorskip("transformers")
    from transformers import ViTConfig, ViTModel

    from agplace_tpu.models.geoloc import ViTBackbone
    from agplace_tpu.train.step import merge_pretrained_subtree

    hf = ViTModel(ViTConfig(hidden_size=64, num_hidden_layers=4,
                            num_attention_heads=4, intermediate_size=256,
                            image_size=32, patch_size=8,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0),
                  add_pooling_layer=False).eval()
    src, _ = convert_vit_b16(hf.state_dict(), heads=4)
    assert "ln1_3" in src  # converter emits every checkpoint layer

    vb = ViTBackbone(hidden=64, layers=4, heads=4, patch=8, trunc_te=2)
    tmpl = vb.init(jax.random.PRNGKey(0),
                   jax.numpy.zeros((1, 32, 32, 3)))["params"]
    tmpl = jax.tree_util.tree_map(lambda x: x, tmpl)  # plain dict copy

    dropped = []
    merged = merge_pretrained_subtree(dict(tmpl), src, "backbone", dropped)
    # identical structure: same treedef as the template
    t1 = jax.tree_util.tree_structure(tmpl)
    t2 = jax.tree_util.tree_structure(merged)
    assert t1 == t2
    assert "ln1_2" not in merged and "ln1_3" not in merged
    assert any("ln1_3" in d for d in dropped)
    # the kept layers really did graft
    np.testing.assert_allclose(np.asarray(merged["ln1_0"]["scale"]),
                               np.asarray(src["ln1_0"]["scale"]))

    # shape mismatch = converter bug = loud failure
    bad = {"ln1_0": {"scale": np.zeros(65, np.float32)}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_pretrained_subtree(dict(tmpl), bad, "backbone", [])
