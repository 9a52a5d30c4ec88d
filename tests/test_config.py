"""Flag-system tests: defaults parity with the reference, config-file
reading (configargparse format), CLI precedence."""

from scade_tpu.utils.config import parse_args


def test_reference_defaults():
    a = parse_args("scannet", ["train"])
    # the workload-defining defaults (run_scade_scannet.py:1100-1202)
    assert a.N_rand == 1024
    assert a.N_samples == 64 and a.N_importance == 128
    assert a.netdepth == 8 and a.netwidth == 256
    assert a.multires == 9 and a.multires_views == 0
    assert a.lrate == 5e-4 and a.decay_step == 400000 and a.decay_rate == 0.1
    assert a.num_iterations == 500000
    assert a.space_carving_weight == 0.007
    assert a.num_hypothesis == 20
    assert a.freeze_ss == 400000
    assert a.scaleshift_lr == 1e-7
    assert a.chunk == 32768
    assert a.use_viewdirs and not a.lindisp


def test_wild_variant_defaults():
    a = parse_args("wild", ["train"])
    assert a.scaleshift_lr == 1e-5  # run_scade_wild.py:1206
    assert a.mask_edges is False
    assert a.scene_id == "kitchen"


def test_config_file_and_cli_precedence(tmp_path):
    cfg = tmp_path / "exp.txt"
    cfg.write_text(
        "# comment\n"
        "N_rand = 512\n"
        "lrate = 1e-3\n"
        "expname = from_file\n"
        "lindisp = true\n"
        "no_reload = false\n"
    )
    a = parse_args("scannet", ["train", "--config", str(cfg)])
    assert a.N_rand == 512 and a.lrate == 1e-3
    assert a.expname == "from_file"
    assert a.lindisp is True
    assert a.no_reload is False

    # CLI flags win over the config file (configargparse precedence)
    a2 = parse_args(
        "scannet", ["train", "--config", str(cfg), "--N_rand", "256"]
    )
    assert a2.N_rand == 256
    assert a2.expname == "from_file"


def test_config_file_bool_typed_options(tmp_path):
    """`key = true` lines must work for type=_bool options (is_joint,
    mask_corners, load_pretrained...), which take a value — a bare --is_joint
    makes argparse exit 2 ('expected one argument')."""
    cfg = tmp_path / "exp.txt"
    cfg.write_text(
        "is_joint = true\n"
        "mask_corners = true\n"
        "load_pretrained = false\n"
        "lindisp = true\n"          # store_true flag: bare form
    )
    a = parse_args("scannet", ["train", "--config", str(cfg)])
    assert a.is_joint is True
    assert a.mask_corners is True
    assert a.load_pretrained is False
    assert a.lindisp is True


def test_config_flag_before_task(tmp_path):
    """--config may precede the positional task (configargparse accepts
    flags in any position)."""
    cfg = tmp_path / "exp.txt"
    cfg.write_text("N_rand = 512\n")
    a = parse_args("scannet", ["--config", str(cfg), "train"])
    assert a.task == "train" and a.N_rand == 512
    assert a.config == str(cfg)


def test_config_equals_form(tmp_path):
    """'--config=path' must load the file like the two-token form — argparse
    accepts the = form, so the pre-scan missing it would silently train with
    defaults while args.config claims the file was used."""
    cfg = tmp_path / "exp.txt"
    cfg.write_text("N_rand = 512\nexpname = eqform\n")
    a = parse_args("scannet", ["train", f"--config={cfg}"])
    assert a.N_rand == 512 and a.expname == "eqform"
    assert a.config == str(cfg)
    # CLI still wins over the file
    a2 = parse_args("scannet", ["train", f"--config={cfg}", "--N_rand", "64"])
    assert a2.N_rand == 64
