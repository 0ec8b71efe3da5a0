"""Config system tests: YAML load, env overlay, profile contract."""

import dataclasses

import pytest

from nvit_tpu.configs import Config, ViTConfig, load_config, merge_dataclass, read_dotenv


def test_defaults_roundtrip():
    cfg = Config()
    assert cfg.training.batch_size == 512
    assert cfg.optimizer.beta2 == 0.95
    assert cfg.model.image_size == 224  # dataclass default (yaml overrides to 32)


def test_packaged_yaml_matches_reference_defaults(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no local settings.yaml → packaged defaults
    cfg = load_config()
    assert cfg.model.image_size == 32
    assert cfg.model.n_embd == 64
    assert cfg.model.use_nvit is True
    assert cfg.model.use_kohonen is True
    assert cfg.model.kohonen_scheduler_enabled is True  # nested yaml → flat key
    assert cfg.model.kohonen_scheduler_warmup_steps == 1000
    assert cfg.training.consistency_weight == 0.1
    assert cfg.data.dataset == "cifar100"


def test_env_override_profile_contract(tmp_path, monkeypatch):
    """≙ profiles/nvit0_k0.env: NVIT_MODEL__USE_NVIT=false etc."""
    monkeypatch.chdir(tmp_path)
    env = {
        "NVIT_MODEL__USE_KOHONEN": "false",
        "NVIT_MODEL__USE_NVIT": "false",
        "NVIT_WANDB__RUN_NAME": "nvit_n0k0",
        "NVIT_TRAINING__BATCH_SIZE": "64",
        "NVIT_OPTIMIZER__LEARNING_RATE": "0.0005",
    }
    cfg = load_config(env=env)
    assert cfg.model.use_nvit is False
    assert cfg.model.use_kohonen is False
    assert cfg.wandb.run_name == "nvit_n0k0"
    assert cfg.training.batch_size == 64
    assert cfg.optimizer.learning_rate == pytest.approx(5e-4)


def test_dotenv_file(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text("# comment\nNVIT_MODEL__N_LAYER=4\nNVIT_SYSTEM__DTYPE=float32\n")
    cfg = load_config(env={})
    assert cfg.model.n_layer == 4
    assert cfg.system.dtype == "float32"


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        merge_dataclass(Config().training, {"not_a_key": 1})


def test_model_validation_kohonen_minimum(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="kohonen_nodes"):
        load_config(env={"NVIT_MODEL__KOHONEN_NODES": "1"})
    # non-square counts are valid (reference default 64 → 32/map was non-square)
    cfg = load_config(env={"NVIT_MODEL__KOHONEN_NODES": "64"})
    assert cfg.model.kohonen_nodes == 64


def test_vitconfig_base_scale_quirk():
    # base_scale default stays 1/sqrt(1024) even for small n_embd (parity quirk)
    cfg = ViTConfig(n_embd=64)
    assert cfg.base_scale == pytest.approx(1.0 / 32.0)


def test_read_dotenv(tmp_path):
    p = tmp_path / ".env"
    p.write_text('A=1\nB="quoted"\n# skip\nbad line\n')
    env = read_dotenv(p)
    assert env == {"A": "1", "B": "quoted"}


def test_config_to_dict():
    d = Config().to_dict()
    assert d["optimizer"]["scheduler"]["type"] == "cosine"
    assert dataclasses.is_dataclass(Config().model)


def test_scalar_over_nested_section_raises():
    """A scalar override on a dataclass-typed field must raise, not silently
    replace the whole section with a string (found driving the CLI: a JSON
    blob in NVIT_DATA__AUGMENTATION corrupted the config and crashed later)."""
    import pytest

    with pytest.raises(TypeError, match="nested keys"):
        merge_dataclass(Config().data, {"augmentation": '{"enabled": false}'})


def test_secrets_yaml_loading(tmp_path, monkeypatch):
    """secrets.yaml: config-tree sections overlay the settings; flat keys feed
    get_secret (≙ reference Dynaconf secrets=, train.py:85-87)."""
    import nvit_tpu.configs.loader as loader

    monkeypatch.chdir(tmp_path)
    (tmp_path / "secrets.yaml").write_text(
        "wandb_api_key: s3cret\nwandb:\n  project: secret-project\n"
    )
    monkeypatch.delenv("NVIT_WANDB_API_KEY", raising=False)
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    cfg = loader.load_config("settings.yaml", env={})
    assert cfg.wandb.project == "secret-project"
    assert loader.get_secret("WANDB_API_KEY") == "s3cret"
    # env var wins over the file
    monkeypatch.setenv("NVIT_WANDB_API_KEY", "env-wins")
    assert loader.get_secret("WANDB_API_KEY") == "env-wins"


def test_every_schema_field_is_env_overridable(tmp_path, monkeypatch):
    """Property: EVERY scalar field of every section accepts an
    NVIT_<SECTION>__<KEY> override (catches merge/normalize typos for new
    fields).  Nested dataclasses are exercised one level deep."""
    import dataclasses as dc

    from nvit_tpu.configs import loader
    from nvit_tpu.configs.schema import Config

    monkeypatch.chdir(tmp_path)

    def bump(value):
        if isinstance(value, bool):
            return (not value), str(not value).lower()
        if isinstance(value, int):
            return value + 1, str(value + 1)
        if isinstance(value, float):
            return value + 0.5, str(value + 0.5)
        if isinstance(value, str):
            return value + "_x", value + "_x"
        return None, None

    cfg0 = Config()
    checked = 0
    for section in dc.fields(cfg0):
        sec_obj = getattr(cfg0, section.name)
        for f in dc.fields(sec_obj):
            cur = getattr(sec_obj, f.name)
            if dc.is_dataclass(cur):
                for g in dc.fields(cur):
                    want, raw = bump(getattr(cur, g.name))
                    if raw is None:
                        continue
                    env = {f"NVIT_{section.name.upper()}__{f.name.upper()}__{g.name.upper()}": raw}
                    got = getattr(
                        getattr(getattr(loader.load_config("settings.yaml", env=env), section.name), f.name),
                        g.name,
                    )
                    assert got == want, (section.name, f.name, g.name)
                    checked += 1
                continue
            want, raw = bump(cur)
            if raw is None:
                continue
            if section.name == "model" and f.name in ("n_embd", "n_head", "n_layer",
                                                      "image_size", "local_patch_size",
                                                      "global_patch_size", "kohonen_nodes"):
                continue  # +1 breaks validate() divisibility; covered by other tests
            if f.name in ("dataset", "dtype", "init_from", "checkpoint_backend",
                          "bounded_softmax", "gated_mlp_kernel", "wandb_mode",
                          "kohonen_hebbian", "moments_dtype", "sr_dither"):
                continue  # enum-validated strings; covered by dedicated tests
            env = {f"NVIT_{section.name.upper()}__{f.name.upper()}": raw}
            got = getattr(getattr(loader.load_config("settings.yaml", env=env), section.name), f.name)
            assert got == want, (section.name, f.name)
            checked += 1
    assert checked > 60  # the sweep actually covered the schema


def test_kohonen_hebbian_enum_and_env_override():
    """kohonen_hebbian: env-overridable enum; invalid values raise at validate().

    The DEFAULT is pinned to "reference" (round-4 ablation, BASELINE.md):
    per-step magnitude parity with the reference's B-iteration loop, the
    only magnitude stable at flagship B*T — silent default drift would
    invalidate both the recorded ablation and the soak configuration."""
    import pytest

    from nvit_tpu.configs import loader
    from nvit_tpu.configs.schema import ViTConfig

    assert loader.load_config(env={}).model.kohonen_hebbian == "reference"
    cfg = loader.load_config(env={"NVIT_MODEL__KOHONEN_HEBBIAN": "reference"})
    assert cfg.model.kohonen_hebbian == "reference"
    cfg = loader.load_config(env={"NVIT_MODEL__KOHONEN_HEBBIAN": "off"})
    assert cfg.model.kohonen_hebbian == "off"
    with pytest.raises(ValueError, match="kohonen_hebbian"):
        ViTConfig(kohonen_hebbian="bogus").validate()


def test_moments_dtype_enum_and_env_override():
    """optimizer.moments_dtype: env-overridable enum (default float32 ≙
    reference AdamW state; bfloat16 = the round-5 SR experiment)."""
    import pytest

    from nvit_tpu.configs import loader
    from nvit_tpu.configs.schema import OptimizerConfig

    assert loader.load_config(env={}).optimizer.moments_dtype == "float32"
    cfg = loader.load_config(env={"NVIT_OPTIMIZER__MOMENTS_DTYPE": "bfloat16"})
    assert cfg.optimizer.moments_dtype == "bfloat16"
    with pytest.raises(ValueError, match="moments_dtype"):
        loader.load_config(env={"NVIT_OPTIMIZER__MOMENTS_DTYPE": "fp8"})
    with pytest.raises(ValueError, match="moments_dtype"):
        OptimizerConfig(moments_dtype="int8").validate()
