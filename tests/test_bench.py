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
