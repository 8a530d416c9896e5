"""Config / CLI argument-system tests (VERDICT r1 weak #3; reference
behaviors: hem/util/arguments.py:152-171, hem/util/misc.py:72-105,
train.py:25-37)."""

import os

import pytest

from hemx.config import (build_base_parser, dump_options, init_working_dir,
                         load_options, parse_args)


def write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


class TestConfigFileParsing:
    def test_at_file_key_value_and_comments(self, tmp_path):
        cfg = write(tmp_path / "a.config", """
# a comment line
model\t\tvae            # trailing comment
batch_size \t 128
lr 1e-4
dataset synthetic
""")
        args = parse_args(["@" + cfg, "--dir", str(tmp_path / "ws")])
        assert args.model == "vae"
        assert args.batch_size == 128
        assert args.lr == 1e-4

    def test_dashed_lines_also_accepted(self, tmp_path):
        cfg = write(tmp_path / "a.config", "--model cnn\n--batch_size 64\n"
                                           "dataset synthetic\n")
        args = parse_args(["@" + cfg, "--dir", str(tmp_path / "ws")])
        assert args.model == "cnn"
        assert args.batch_size == 64

    def test_config_flag_rewritten_to_at_file(self, tmp_path):
        """v1 semantics: --config FILE == @FILE (reference train.py:25-37)."""
        cfg = write(tmp_path / "v1.config", "model wgan\nlr 2.5e-5\n"
                                            "dataset synthetic\n")
        args = parse_args(["--config", cfg, "--dir", str(tmp_path / "ws")])
        assert args.model == "wgan"
        assert args.lr == 2.5e-5

    def test_cli_overrides_config(self, tmp_path):
        """Precedence: CLI > config file (doc/guide.tex:60-61)."""
        cfg = write(tmp_path / "a.config", "model cnn\nlr 1e-3\nbatch_size 32\n"
                                           "dataset synthetic\n")
        args = parse_args(["@" + cfg, "--lr", "5e-5",
                           "--dir", str(tmp_path / "ws")])
        assert args.lr == 5e-5          # CLI wins
        assert args.batch_size == 32    # config survives

    def test_plugin_args_in_config_files(self, tmp_path):
        """Dataset/model-plugin flags inside config files resolve through
        the three-phase parse (hem/util/arguments.py:152-163)."""
        cfg = write(tmp_path / "a.config", """
model iwgan
dataset synthetic
synthetic_count 48
synthetic_shape 32 32 3
latent_size 24
n_disc_train 3
""")
        args = parse_args(["@" + cfg, "--dir", str(tmp_path / "ws")])
        assert args.synthetic_count == 48
        assert args.synthetic_shape == [32, 32, 3]
        assert args.latent_size == 24
        assert args.n_disc_train == 3

    def test_unknown_args_warn_but_run(self, tmp_path, capsys):
        args = parse_args(["--model", "cnn", "--dataset", "synthetic",
                           "--totally_bogus", "1",
                           "--dir", str(tmp_path / "ws")])
        out = capsys.readouterr().out
        assert "unknown and unused arguments" in out
        assert "totally_bogus" in out
        assert args.model == "cnn"

    def test_seed_randomized_when_unset(self, tmp_path):
        a1 = parse_args(["--dataset", "synthetic", "--dir", str(tmp_path)])
        assert a1.seed is not None
        # actually randomized, not a fixed fallback: two parses must differ
        # (4-byte entropy -> collision odds ~2^-32; retry once to be safe)
        a2 = parse_args(["--dataset", "synthetic", "--dir", str(tmp_path)])
        if a2.seed == a1.seed:
            a2 = parse_args(["--dataset", "synthetic", "--dir",
                             str(tmp_path)])
        assert a2.seed != a1.seed

    def test_shuffle_negatable(self, tmp_path):
        a = parse_args(["--dataset", "synthetic", "--dir", str(tmp_path)])
        assert a.shuffle is True
        a = parse_args(["--dataset", "synthetic", "--no-shuffle",
                        "--dir", str(tmp_path)])
        assert a.shuffle is False


class TestOptionsRoundTrip:
    def test_options_config_reingestable(self, tmp_path):
        """The resolved options dump re-parses to identical settings
        (reference: hem/util/misc.py:96-105 'options.config')."""
        ws = str(tmp_path / "ws")
        args = parse_args(["--model", "iwgan", "--dataset", "synthetic",
                           "--lr", "1e-4", "--batch_size", "96",
                           "--no-shuffle", "--latent_size", "32",
                           "--seed", "3", "--dir", ws])
        init_working_dir(args)
        reparsed = parse_args(["@" + os.path.join(ws, "options.config")])
        for key in ("model", "dataset", "lr", "batch_size", "shuffle",
                    "latent_size", "seed", "dir", "epochs", "optimizer"):
            assert getattr(reparsed, key) == getattr(args, key), key

    def test_negatable_false_round_trips(self, tmp_path):
        """shuffle=False must survive dump->reparse (it is dumped as
        no-shuffle; a bare omission would silently re-enable it)."""
        path = str(tmp_path / "opts.config")
        import types
        dump_options(types.SimpleNamespace(shuffle=False, model="cnn"), path)
        text = open(path).read()
        assert "no-shuffle" in text
        p = build_base_parser()
        ns, _ = p.parse_known_args(["@" + path])
        assert ns.shuffle is False

    def test_device_data_cache_false_round_trips(self, tmp_path):
        """--no-device_data_cache must survive the options.config
        round-trip (it is default-true; a bare omission would silently
        re-enable the device cache on a resumed run that disabled it,
        e.g. to keep a large split out of HBM)."""
        path = str(tmp_path / "opts.config")
        import types
        dump_options(types.SimpleNamespace(device_data_cache=False,
                                           model="cnn"), path)
        assert "no-device_data_cache" in open(path).read()
        p = build_base_parser()
        ns, _ = p.parse_known_args(["@" + path])
        assert ns.device_data_cache is False

    def test_options_json_twin(self, tmp_path):
        ws = str(tmp_path / "ws")
        args = parse_args(["--model", "vae", "--dataset", "synthetic",
                           "--seed", "9", "--dir", ws])
        init_working_dir(args)
        opts = load_options(os.path.join(ws, "options.json"))
        assert opts["model"] == "vae"
        assert opts["seed"] == 9


class TestExampleConfigs:
    def test_every_example_config_parses(self, tmp_path):
        """Every committed example config must survive a full three-phase
        parse (this is what pins plugin-arg renames — VERDICT r1 #5)."""
        root = os.path.join(os.path.dirname(__file__), "..", "examples")
        configs = []
        for dirpath, _, files in os.walk(root):
            configs += [os.path.join(dirpath, f) for f in files
                        if f.endswith(".config")]
        assert len(configs) >= 50, f"expected the full corpus, found {len(configs)}"
        for cfg in configs:
            args = parse_args(["@" + cfg, "--dir", str(tmp_path / "ws")])
            assert args.model, cfg
            assert args.dataset, cfg

    def test_example_configs_use_known_flags(self, tmp_path, capsys):
        """No example config may rely on an unknown (ignored) flag."""
        root = os.path.join(os.path.dirname(__file__), "..", "examples")
        for dirpath, _, files in os.walk(root):
            for f in files:
                if not f.endswith(".config"):
                    continue
                cfg = os.path.join(dirpath, f)
                parse_args(["@" + cfg, "--dir", str(tmp_path / "ws")])
                out = capsys.readouterr().out
                assert "unknown and unused" not in out, (cfg, out)
