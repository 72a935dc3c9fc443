"""CLI runner flows on tiny configs: every reference run-type x model-type
combination either runs end-to-end or is explicitly rejected (main.py:502-525
sweep surface; VERDICT r1 'finish the long tail of CLI parity')."""

import os

import numpy as np
import pytest

from snd_vae_tpu import cli
from snd_vae_tpu.config import Config, DecoderConfig, EncoderConfig, TrainConfig


def tiny_cfg(tmp_path, **kw) -> Config:
    train = TrainConfig(
        batch_size=4, epochs=2, learning_rate=3e-3, checkpoint_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
    )
    base = dict(
        dataset="synthetic2",
        num_nodes=6,
        sampling_num=2,
        encoder=EncoderConfig(
            s_channels=(4,), s_kernel_sizes=(3,), s_strides=(1,),
            s_hidden_size=8, s_latent_size=4,
            g_conv_hidden=(4,), g_hidden_size=8, g_latent_size=4,
            sg_conv_hidden=((4, 4, 4),), sg_hidden_size=8, sg_latent_size=4,
        ),
        decoder=DecoderConfig(
            node_h_size=4, s_d_channels=(4,), s_d_kernel_sizes=(3,),
            s_d_strides=(1,), n_d_channels=(4,), n_d_kernel_sizes=(3,),
            n_d_strides=(1,), e_d_hidden=(4,),
        ),
        train=train,
    )
    base.update(kw)
    return Config(**base)


def _train_then(cfg, tmp_path):
    """Short train so eval modes restore a real checkpoint."""
    # load_dataset synthesizes 200 graphs by default; keep it tiny
    from snd_vae_tpu.checkpoint import Checkpointer
    from snd_vae_tpu.data import loaders
    from snd_vae_tpu.train import Trainer

    batch = loaders.load_dataset(cfg, "train", num_graphs=4)
    trainer = Trainer(cfg, batch, workdir=str(tmp_path))
    trainer.run(epochs=1, verbose=False)
    return trainer


def test_disentangled_full_flow(tmp_path):
    """train -> reconstruct (latent dumps) -> generation -> all three
    traverse modes for the flagship model."""
    cfg = tiny_cfg(tmp_path)
    _train_then(cfg, tmp_path)

    rec = cli.run_test_reconstruct(cfg, str(tmp_path))
    assert np.isfinite(rec["edge_acc"])
    qdir = os.path.join(str(tmp_path), "qualitative_evaluation", cfg.dataset)
    assert os.path.exists(os.path.join(qdir, "disentangled_z_s.npy"))

    gen = cli.run_test_generation(cfg, str(tmp_path), num_generate=8)
    assert any(np.isfinite(v) for v in gen.values())

    for mode, group in (("generation", "sg"), ("single", "g"), ("latent", "sg")):
        path = cli.run_test_disentangle(
            cfg, str(tmp_path), mode=mode, group=group, dim=1
        )
        assert os.path.exists(path)

    with pytest.raises(ValueError, match="unknown traverse mode"):
        cli.run_test_disentangle(cfg, str(tmp_path), mode="nope")


def test_base_model_flow(tmp_path):
    """The base/joint model's test_disentangle runs via its single-latent
    sweep (traverse_joint, model_joint.py:192-206) — previously crashed
    looking for nonexistent z_s/z_g dumps (VERDICT r1 missing #6)."""
    cfg = tiny_cfg(tmp_path, model_type="base")
    _train_then(cfg, tmp_path)
    rec = cli.run_test_reconstruct(cfg, str(tmp_path))
    assert np.isfinite(rec["edge_acc"])
    qdir = os.path.join(str(tmp_path), "qualitative_evaluation", cfg.dataset)
    assert os.path.exists(os.path.join(qdir, "base_z_sg.npy"))
    assert not os.path.exists(os.path.join(qdir, "base_z_s.npy"))
    path = cli.run_test_disentangle(cfg, str(tmp_path), dim=2)
    assert os.path.exists(path)


def test_quality_flag_builds_recommended_config():
    """--quality applies the sweep-recommended operating point (BASELINE.md
    quality sweep: beta=0.1 + weighted BCE + edge_from_coords + bf16), and
    an explicit --beta still wins over the bundle."""
    from types import SimpleNamespace

    def ns(**kw):
        base = dict(dataset="synthetic2", model_type=None, epochs=None,
                    dataset_path=None, beta=None)
        base.update(kw)
        return SimpleNamespace(**base)
    cfg = cli._build_cfg(ns(quality=True))
    assert cfg.loss.beta == 0.1
    assert cfg.loss.use_weighted_bce
    assert cfg.decoder.edge_from_coords
    assert not cfg.decoder.efc_stop_grad   # coupled efc won the sweep
    assert cfg.compute_dtype == "bfloat16"

    cfg = cli._build_cfg(ns(quality=True, beta=0.5))
    assert cfg.loss.beta == 0.5            # explicit flag overrides bundle
    assert cfg.loss.use_weighted_bce

    cfg = cli._build_cfg(ns())
    assert cfg.loss.beta == 1.0            # default untouched
    assert not cfg.decoder.edge_from_coords


def test_quality_flag_is_dataset_aware():
    """--quality folds each dataset's best RECORDED operating point
    (VERDICT r2 item 5): synthetic1 raises beta to 3 (fixes the generated-
    density overshoot), protein/mnist normalize coordinates, scene keeps the
    reference recipe (only bf16)."""
    from types import SimpleNamespace

    def ns(**kw):
        base = dict(dataset="synthetic2", model_type=None, epochs=None,
                    dataset_path=None, beta=None, quality=True)
        base.update(kw)
        return SimpleNamespace(**base)

    c1 = cli._build_cfg(ns(dataset="synthetic1"))
    assert c1.loss.beta == 3.0 and c1.loss.use_weighted_bce
    assert c1.decoder.edge_from_coords and not c1.normalize_coords

    for d in ("protein", "mnist"):
        c = cli._build_cfg(ns(dataset=d))
        assert c.normalize_coords and c.loss.beta == 0.1

    cs = cli._build_cfg(ns(dataset="scene"))
    assert cs.compute_dtype == "bfloat16"
    assert cs.loss.beta == 1.0 and not cs.loss.use_weighted_bce
    assert not cs.decoder.edge_from_coords and not cs.normalize_coords

    c3 = cli._build_cfg(ns(dataset="synthetic3"))
    assert c3.loss.beta == 0.1 and c3.decoder.edge_from_coords


def test_remat_flag_threads_into_config():
    from types import SimpleNamespace

    def ns(**kw):
        base = dict(dataset="synthetic2", model_type=None, epochs=None,
                    dataset_path=None, beta=None)
        base.update(kw)
        return SimpleNamespace(**base)

    assert not cli._build_cfg(ns()).remat
    assert cli._build_cfg(ns(remat=True)).remat


def test_synthetic3_base_flow(tmp_path):
    """synthetic3 is selectable end-to-end; under the joint model its
    coordinate head is linear (model_joint.py:118-121), so decoded coords
    can leave [0, 1]."""
    from snd_vae_tpu.config import preset

    assert "synthetic3" in cli.cfg_mod.PRESETS
    p = preset("synthetic3")
    assert p.dataset == "synthetic3" and p.spatial_dim == 2

    cfg = tiny_cfg(tmp_path, dataset="synthetic3", model_type="base")
    trainer = _train_then(cfg, tmp_path)
    gen = cli.run_test_generation(cfg, str(tmp_path), num_generate=4)
    assert any(np.isfinite(v) for v in gen.values())


def test_run_train_dumps_resolved_config(tmp_path):
    """Every training run persists its fully-resolved config as JSON (the
    reference's runs are irreproducible — flags mutate at runtime,
    main.py:136-241)."""
    import json

    cfg = tiny_cfg(tmp_path)
    cli.run_train(cfg, str(tmp_path), epochs=1)
    p = os.path.join(
        str(tmp_path), cfg.train.log_dir,
        f"config_{cfg.dataset}_{cfg.model_type}.json",
    )
    with open(p) as f:
        dumped = json.load(f)
    assert dumped["dataset"] == cfg.dataset
    assert dumped["train"]["batch_size"] == cfg.train.batch_size
    assert dumped["encoder"]["sg_latent_size"] == cfg.encoder.sg_latent_size


def test_latent_size_flags():
    """--s/g/sg-latent-size override the preset encoder widths (reference
    flags main.py:47,52,57)."""
    from snd_vae_tpu.config import preset

    ns = cli.build_parser().parse_args([
        "--dataset", "synthetic2", "--s-latent-size", "7",
        "--sg-latent-size", "64",
    ])
    cfg = cli._build_cfg(ns)
    assert cfg.encoder.s_latent_size == 7
    assert cfg.encoder.sg_latent_size == 64
    assert cfg.encoder.g_latent_size == preset("synthetic2").encoder.g_latent_size
