"""bench.py unit coverage that needs no device: the artifact-attachment
path that folds round FID / e2e results into the headline JSON detail."""

import json
import os

import bench


class TestAttachArtifacts:
    def _with_root(self, tmp_path, monkeypatch):
        """Point bench's repo-root discovery at a temp dir."""
        fake_file = tmp_path / "bench.py"
        fake_file.write_text("")
        monkeypatch.setattr(bench, "__file__", str(fake_file))
        return tmp_path

    def test_noop_without_artifacts(self, tmp_path, monkeypatch):
        self._with_root(tmp_path, monkeypatch)
        result = {"metric": "m", "value": 1.0}
        bench._attach_artifacts(result)
        assert "detail" not in result

    def test_attaches_fid_and_e2e_details(self, tmp_path, monkeypatch):
        root = self._with_root(tmp_path, monkeypatch)
        art = root / "workspace" / "artifacts"
        art.mkdir(parents=True)
        (art / "fid.json").write_text(json.dumps(
            {"metric": "fid", "detail": {"fid_pixel": 3.5,
                                         "extractor": "pixel8x8"}}))
        (art / "e2e.json").write_text(json.dumps(
            {"metric": "e2e", "detail": {"first_epoch_penalty": 1.4}}))
        result = {"metric": "m", "value": 1.0, "detail": {"n_chips": 1}}
        bench._attach_artifacts(result)
        assert result["detail"]["fid"]["fid_pixel"] == 3.5
        assert result["detail"]["e2e"]["first_epoch_penalty"] == 1.4
        # pre-existing detail keys survive
        assert result["detail"]["n_chips"] == 1

    def test_tracked_fallback_and_fresh_precedence(self, tmp_path,
                                                   monkeypatch):
        """workspace/ is wiped between sessions; the tracked artifacts/
        copies must attach when the fresh ones are gone, and a fresh
        workspace copy must win over a stale tracked one."""
        root = self._with_root(tmp_path, monkeypatch)
        tracked = root / "artifacts"
        tracked.mkdir()
        (tracked / "fid.json").write_text(json.dumps(
            {"metric": "fid", "detail": {"fid_pixel": 0.28}}))
        (tracked / "e2e.json").write_text(json.dumps(
            {"metric": "e2e", "detail": {"steady_epoch_s": 9.0}}))
        result = {"metric": "m", "value": 1.0}
        bench._attach_artifacts(result)
        assert result["detail"]["fid"]["fid_pixel"] == 0.28
        assert result["detail"]["e2e"]["steady_epoch_s"] == 9.0

        fresh = root / "workspace" / "artifacts"
        fresh.mkdir(parents=True)
        (fresh / "e2e.json").write_text(json.dumps(
            {"metric": "e2e", "detail": {"steady_epoch_s": 4.0}}))
        result = {"metric": "m", "value": 1.0}
        bench._attach_artifacts(result)
        assert result["detail"]["e2e"]["steady_epoch_s"] == 4.0  # fresh wins
        assert result["detail"]["fid"]["fid_pixel"] == 0.28  # tracked fills

    def test_malformed_artifact_ignored(self, tmp_path, monkeypatch):
        root = self._with_root(tmp_path, monkeypatch)
        art = root / "workspace" / "artifacts"
        art.mkdir(parents=True)
        (art / "fid.json").write_text("{not json")
        (art / "e2e.json").write_text(json.dumps({"no_detail": True}))
        result = {"metric": "m", "value": 1.0}
        bench._attach_artifacts(result)
        assert "fid" not in result.get("detail", {})
        assert "e2e" not in result.get("detail", {})


class TestRunE2E:
    """Drive the full --e2e path (TFRecord write -> parse -> uint8 H2D ->
    on-chip normalize -> train step -> epoch timing) on the 8-device CPU
    mesh at tiny sizes, for both workloads."""

    def _args(self, tmp_path, model, device_cache=False):
        import types
        return types.SimpleNamespace(
            batch=16, image=32, latent=16, steps=2, warmup=1, no_fused=False,
            e2e_count=96, e2e_epochs=3, cache=str(tmp_path), model=model,
            device_cache=device_cache, device_cache_mb=1024)

    def _check(self, result, model, expect_ref):
        assert result["unit"] == "images/sec/chip"
        assert model.upper() in result["metric"]
        d = result["detail"]
        assert d["steady_statistic"] == "median"
        assert len(d["steady_epochs_all_s"]) == 2
        assert d["first_epoch_s"] > 0 and d["steady_epoch_s"] > 0
        assert d["reference_images_per_sec_2gpu"] == round(expect_ref, 2)
        # non-default --batch/--image: ratio must be flagged not reported
        assert result["vs_baseline"] is None
        assert "not comparable" in result["vs_baseline_note"]

    def test_cnn_pipeline(self, tmp_path):
        args = self._args(tmp_path, "cnn")
        result = bench.run_e2e(args)
        assert result["detail"]["calls_per_epoch"] == 6  # 96/16 batches
        self._check(result, "cnn", bench.REF_CNN_IMG_PER_SEC)

    def test_iwgan_pipeline(self, tmp_path):
        args = self._args(tmp_path, "iwgan")
        result = bench.run_e2e(args)
        assert result["detail"]["calls_per_epoch"] == 1  # 6 batches/call
        self._check(result, "iwgan", bench.REF_IWGAN_IMG_PER_SEC)

    def test_cnn_device_cache(self, tmp_path):
        args = self._args(tmp_path, "cnn", device_cache=True)
        result = bench.run_e2e(args)
        assert "device-resident cache" in result["metric"]
        self._check(result, "cnn", bench.REF_CNN_IMG_PER_SEC)

    def test_device_cache_over_budget_is_diagnostic(self, tmp_path):
        """An over-budget dataset must exit with the actionable message,
        not crash later on a None pipeline (python -O stripped the old
        assert entirely)."""
        import pytest
        args = self._args(tmp_path, "cnn", device_cache=True)
        args.device_cache_mb = 0
        with pytest.raises(SystemExit, match="device_cache_mb"):
            bench.run_e2e(args)


class TestBaselineFlagging:
    """vs_baseline must only be reported at each workload's OWN reference
    config: IWGAN's record is bs512/64px, the CNN transcript's is
    bs1024/64px (model-aware since round 3; ADVICE r2)."""

    def _result(self):
        return {"vs_baseline": 1.5}

    def _args(self, batch, image):
        import types
        return types.SimpleNamespace(batch=batch, image=image)

    def test_iwgan_baseline_config_keeps_ratio(self):
        r = self._result()
        bench._flag_nonbaseline_config(r, self._args(512, 64), "iwgan")
        assert r["vs_baseline"] == 1.5 and "vs_baseline_note" not in r

    def test_cnn_baseline_is_bs1024(self):
        r = self._result()
        bench._flag_nonbaseline_config(r, self._args(1024, 64), "cnn")
        assert r["vs_baseline"] == 1.5 and "vs_baseline_note" not in r

    def test_cnn_at_bs512_is_flagged(self):
        # the exact apples-to-oranges case: hemx CNN at bs512 vs the
        # reference's bs1024 record
        r = self._result()
        bench._flag_nonbaseline_config(r, self._args(512, 64), "cnn")
        assert r["vs_baseline"] is None
        assert "bs1024" in r["vs_baseline_note"]

    def test_iwgan_offsize_is_flagged(self):
        r = self._result()
        bench._flag_nonbaseline_config(r, self._args(256, 64), "iwgan")
        assert r["vs_baseline"] is None
        assert "bs512" in r["vs_baseline_note"]


class TestStdoutContract:
    """BENCH_r03 came back `parsed: null` because bench's stdout line
    outgrew the driver's tail capture. Pin the contract: stdout is ONE
    short json.loads-able line regardless of how much artifact detail is
    attached; the full result lands in the detail files."""

    def _fake_result(self):
        return {"metric": "IWGAN train images/sec/chip (bs512)",
                "value": 1178.0, "unit": "images/sec/chip",
                "vs_baseline": 2.322,
                "detail": {"step_time_s": 0.4346, "n_chips": 1}}

    def test_one_short_parseable_line(self, tmp_path, monkeypatch, capsys):
        import sys
        fake_file = tmp_path / "bench.py"
        fake_file.write_text("")
        monkeypatch.setattr(bench, "__file__", str(fake_file))
        # bulky attached artifacts must NOT leak into stdout
        art = tmp_path / "workspace" / "artifacts"
        art.mkdir(parents=True)
        (art / "fid.json").write_text(json.dumps(
            {"detail": {"fid_pixel": 0.28, "provenance": "x" * 2000}}))
        (art / "e2e.json").write_text(json.dumps(
            {"detail": {"steady_epoch_s": 4.7, "pad": "y" * 2000}}))
        monkeypatch.setattr(bench, "run_compute",
                            lambda args: self._fake_result())
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        bench.main()
        out = capsys.readouterr().out.strip()
        assert "\n" not in out, "stdout must be exactly one line"
        assert len(out) < 1000, f"headline line too long: {len(out)}"
        line = json.loads(out)
        for k in ("metric", "value", "unit", "vs_baseline", "step_time_s",
                  "n_chips", "detail_file"):
            assert k in line, k
        assert line["value"] == 1178.0
        # the full detail (attached artifacts included) is in the files
        detail = json.loads(
            (tmp_path / "artifacts" / "bench_detail.json").read_text())
        assert detail["detail"]["fid"]["fid_pixel"] == 0.28
        assert detail["detail"]["e2e"]["steady_epoch_s"] == 4.7
        assert detail["detail"]["provenance"]["argv"] == "bench.py"
        fresh = json.loads((art / "bench_detail.json").read_text())
        assert fresh["value"] == 1178.0

    def test_explicit_out_file(self, tmp_path, monkeypatch, capsys):
        import sys
        fake_file = tmp_path / "bench.py"
        fake_file.write_text("")
        monkeypatch.setattr(bench, "__file__", str(fake_file))
        monkeypatch.setattr(bench, "run_compute",
                            lambda args: self._fake_result())
        out_path = tmp_path / "r.json"
        monkeypatch.setattr(sys, "argv", ["bench.py", "--out",
                                          str(out_path)])
        bench.main()
        line = json.loads(capsys.readouterr().out.strip())
        assert line["detail_file"].endswith("r.json")
        assert json.loads(out_path.read_text())["value"] == 1178.0
