"""The shipped best-hparam configs load and validate (reference
README.md:434-464 tables as runnable JSON)."""

import glob
import os

import pytest

from audio_few_shot_learning_tpu.config import load_configs

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
EXPERIMENTS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_DIR, "*.json")) if "model_config" not in p
)


def test_configs_exist():
    assert len(EXPERIMENTS) == 15  # 5 datasets x {cpl, apl, plain}


@pytest.mark.parametrize("path", EXPERIMENTS)
def test_config_loads_and_validates(path):
    exp, mdl = load_configs(path, os.path.join(CONFIG_DIR, "model_config.json"))
    exp.validate()
    assert exp.n_way_train == 5 and exp.n_shot_train == 5
    assert exp.n_testing_tasks == 2000
    name = os.path.basename(path)
    if "_cpl" in name:
        assert exp.loss.cpl.use and not exp.loss.angular.use
    elif "_apl" in name:
        assert exp.loss.angular.use and not exp.loss.cpl.use
    else:
        assert not exp.use_contrastive


def test_best_hparams_match_reference_tables():
    exp, _ = load_configs(
        os.path.join(CONFIG_DIR, "fsd2018_cpl.json"),
        os.path.join(CONFIG_DIR, "model_config_fsd2018.json"),
    )
    # README.md:436-442 row FSD: mask 16 / W 22 / 1 mask / p .282 / lr 7e-4 / gamma .4482
    assert exp.specaug_params.mask_param == 16
    assert exp.specaug_params.W == 22
    assert exp.lr == 0.0007
    assert exp.scheduler_gamma == 0.4482
    # README.md:445-453 row FSD: l 2.022308 / T 9.2361 / M 5
    assert exp.loss.cpl.m_param == 5
    assert abs(exp.loss.l_param - 2.022308) < 1e-9
    assert exp.multi_segm


def test_remat_policy_auto_and_explicit():
    from audio_few_shot_learning_tpu.config import TPUConfig

    # auto: per-backward episode count below 4 -> off, >= 4 -> on
    assert not TPUConfig(episode_batch=1).remat_enabled()
    assert not TPUConfig(episode_batch=2).remat_enabled()
    assert TPUConfig(episode_batch=4).remat_enabled()
    # grad accumulation: the microbatch is what hits a single backward
    assert not TPUConfig(episode_batch=8, episode_microbatch=2).remat_enabled()
    assert TPUConfig(episode_batch=8, episode_microbatch=4).remat_enabled()
    # explicit values always win
    assert TPUConfig(episode_batch=1, remat=True).remat_enabled()
    assert not TPUConfig(episode_batch=8, remat=False).remat_enabled()
