"""Config system: composition, interpolation, overrides, registry."""

from unified_video_action_tpu.config import CONFIG_ROOT, Cfg, load_config


def test_load_uva_pusht():
    cfg = load_config("uva_pusht")
    assert cfg["task"]["name"] == "pusht"
    assert cfg["model"]["policy"]["autoregressive_model_params"]["model_size"] == "mar_base"
    # interpolation: shape_meta flows from task into model.policy
    assert cfg["model"]["policy"]["shape_meta"]["action"]["shape"] == [2]
    assert cfg["training"]["num_epochs"] == 3050


def test_overrides():
    cfg = load_config(
        "uva_pusht",
        overrides=[
            "training.debug=true",
            "model.policy.action_model_params.predict_action=true",
            "dataloader.batch_size=4",
        ],
    )
    assert cfg["training"]["debug"] is True
    assert cfg["model"]["policy"]["action_model_params"]["predict_action"] is True
    assert cfg["dataloader"]["batch_size"] == 4


def test_attribute_access_and_to_dict():
    cfg = load_config("uva_pusht")
    assert cfg.task.name == "pusht"
    d = cfg.to_dict()
    assert isinstance(d, dict) and not isinstance(d, Cfg)
