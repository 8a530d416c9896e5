"""tfevents writer/reader round-trip + TFRecord + proto tests
(SURVEY.md §7.3: verify TensorBoard-format framing without TF)."""

import os
import struct

import numpy as np
import pytest

from hemx.summaries import proto
from hemx.summaries.crc32c import crc32c, masked_crc32c
from hemx.summaries.events import EventsWriter, SummaryWriterSet
from hemx.summaries.montage import factorization, montage
from hemx.summaries.png import decode_png, encode_png
from hemx.summaries.reader import get_all_events, get_tag_values, iter_events
from hemx.data.tfrecord import TFRecordWriter, count_records, tfrecord_iterator


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43
        assert crc32c(bytes(range(32))) == 0x46DD794E

    def test_masked(self):
        # mask is reversible: unmask(mask(x)) == x
        data = b"hello tfrecord"
        m = masked_crc32c(data)
        crc = ((m - 0xA282EAD8) & 0xFFFFFFFF)
        crc = ((crc >> 17) | (crc << 15)) & 0xFFFFFFFF
        assert crc == crc32c(data)


class TestProto:
    def test_varint_roundtrip(self):
        for n in (0, 1, 127, 128, 300, 2 ** 32, 2 ** 60):
            buf = proto.enc_varint(n)
            got, pos = proto.dec_varint(buf, 0)
            assert got == n and pos == len(buf)

    def test_example_roundtrip(self):
        ex = proto.example({
            "image": proto.feature_bytes([b"\x01\x02\x03"]),
            "label": proto.feature_int64([7]),
            "scale": proto.feature_float([1.5, 2.5]),
        })
        parsed = proto.parse_example(ex)
        assert parsed["image"]["bytes"][0] == b"\x01\x02\x03"
        assert parsed["label"]["int64"] == [7]
        np.testing.assert_allclose(parsed["scale"]["float"], [1.5, 2.5])


class TestTFRecord:
    def test_roundtrip_and_count(self, tmp_path):
        path = str(tmp_path / "test.tfrecords")
        records = [b"first", b"second record", b"x" * 1000]
        with TFRecordWriter(path) as w:
            for r in records:
                w.write(r)
        got = list(tfrecord_iterator(path, verify=True))
        assert got == records
        assert count_records(path) == 3
        # count is cached
        assert os.path.exists(path + ".count")
        assert count_records(path) == 3


class TestEvents:
    def test_scalar_roundtrip(self, tmp_path):
        logdir = str(tmp_path / "train")
        w = EventsWriter(logdir)
        w.scalar("losses/g_loss", 1.5, step=10)
        w.scalar("losses/g_loss", 1.25, step=20)
        w.scalar("losses/d_loss", 0.5, step=10)
        w.close()
        events = get_all_events(logdir)
        assert set(events) == {"losses/g_loss", "losses/d_loss"}
        series = get_tag_values(logdir, "losses/g_loss")
        assert [s for s, _ in series] == [10, 20]
        assert series[0][1] == pytest.approx(1.5)

    def test_dedup_by_step_latest_wins(self, tmp_path):
        logdir = str(tmp_path / "train")
        w = EventsWriter(logdir)
        w.scalar("loss", 5.0, step=10)
        w.scalar("loss", 3.0, step=10)  # later wall time, same step
        w.close()
        series = get_tag_values(logdir, "loss")
        assert len(series) == 1
        assert series[0][1] == pytest.approx(3.0)

    def test_histogram_and_image(self, tmp_path):
        logdir = str(tmp_path / "train")
        w = EventsWriter(logdir)
        w.histogram("weights/w1", np.random.default_rng(0).normal(size=1000), 5)
        img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        w.image("examples/img", img, 5)
        w.montage("examples/grid", np.stack([img] * 4), 5)
        w.close()
        evs = [e for p in [logdir] for e in
               iter_events(next(iter(
                   __import__("glob").glob(os.path.join(logdir, "events*")))))]
        tags = {v.get("tag") for e in evs for v in e["values"]}
        assert {"weights/w1", "examples/img", "examples/grid"} <= tags

    def test_histogram_image_dedup_by_step(self, tmp_path):
        """Resumed runs re-emit steps into a new events file; histogram and
        image readers must dedup by step favoring latest wall time, like
        the scalar path (they used to return both entries, garbling the
        percentile fan's steps axis)."""
        from hemx.summaries.reader import (get_histogram_values,
                                           get_image_values)
        logdir = str(tmp_path / "train")
        # explicit suffixes force two FILES: same-second writers otherwise
        # share one filename (open 'ab') and the cross-file dedup this
        # test documents would silently never be exercised
        w1 = EventsWriter(logdir, filename_suffix="a")
        w1.histogram("w", np.zeros(10), step=5)
        w1.image("img", np.zeros((4, 4, 3), np.uint8), step=5)
        w1.close()
        w2 = EventsWriter(logdir, filename_suffix="b")  # "resume" file
        w2.histogram("w", np.ones(10), step=5)
        w2.image("img", np.full((4, 4, 3), 255, np.uint8), step=5)
        w2.close()
        hs = get_histogram_values(logdir, "w")
        assert [s for s, _ in hs] == [5]
        assert hs[0][1]["max"] == pytest.approx(1.0)  # latest wins
        imgs = get_image_values(logdir, "img")
        assert [s for s, _ in imgs] == [5]

    def test_all_nan_histogram_is_empty_not_zero(self, tmp_path):
        """An all-non-finite tensor must write an honest empty histogram
        (num=0), not fabricate a single healthy-looking 0.0 observation
        that masks the divergence."""
        from hemx.summaries.reader import get_histogram_values
        logdir = str(tmp_path / "train")
        w = EventsWriter(logdir)
        w.histogram("diverged", np.full(100, np.nan), step=1)
        w.close()
        (step, h), = get_histogram_values(logdir, "diverged")
        assert step == 1
        assert h["num"] == 0.0 and h["bucket"] == []

    def test_writer_set(self, tmp_path):
        ws = SummaryWriterSet(str(tmp_path))
        for phase in ("train", "validate", "test"):
            ws[phase].scalar("l", 1.0, 1)
        ws.close()
        for phase in ("train", "validate", "test"):
            assert get_tag_values(str(tmp_path / phase), "l")

    def test_file_version_header(self, tmp_path):
        logdir = str(tmp_path)
        w = EventsWriter(logdir)
        w.close()
        events = list(iter_events(w.path))
        assert events  # at least the version event
        # first event's record must contain file_version field
        with open(w.path, "rb") as f:
            header = f.read(8)
            (ln,) = struct.unpack("<Q", header)
            f.read(4)
            rec = f.read(ln)
        fields = {field: v for field, _, v in proto.iter_fields(rec)}
        assert fields[3] == b"brain.Event:2"


class TestPng:
    def test_roundtrip_rgb(self):
        img = np.random.default_rng(0).integers(0, 256, (20, 30, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    def test_roundtrip_gray(self):
        img = np.random.default_rng(1).integers(0, 256, (8, 8), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img))[..., 0], img)


class TestMontage:
    def test_factorization(self):
        assert factorization(64) == (8, 8)
        assert factorization(12) == (3, 4)
        assert factorization(7) == (1, 7)

    def test_montage_shape(self):
        imgs = np.zeros((6, 10, 12, 3), np.float32)
        m = montage(imgs, grid=(2, 3), pad=1)
        assert m.shape == (2 * 11 + 1, 3 * 13 + 1, 3)


class TestNative:
    """C++ data-loader extension (hemx/native) vs pure-python reference."""

    def _native(self):
        from hemx import native
        mod = native.load()
        if mod is None:
            pytest.skip("native toolchain unavailable")
        return mod

    def test_crc32c_matches_python(self):
        mod = self._native()
        from hemx.summaries.crc32c import _py_crc32c
        for data in (b"", b"a", b"hello tfrecord", bytes(range(256)) * 7):
            assert mod.crc32c(data) == _py_crc32c(data)

    def test_read_write_roundtrip(self, tmp_path):
        mod = self._native()
        path = str(tmp_path / "native.tfrecords")
        records = [b"first", b"x" * 1000, b"", b"last"]
        mod.write_records(path, records)
        # native wrote it; python reader must agree (format compat)
        from hemx.data.tfrecord import tfrecord_iterator
        assert list(tfrecord_iterator(path, verify=True)) == records
        # and native reads what python writes
        path2 = str(tmp_path / "py.tfrecords")
        from hemx.data.tfrecord import TFRecordWriter
        with TFRecordWriter(path2) as w:
            for r in records:
                w.write(r)
        assert mod.read_all_records(path2, True) == records
        assert mod.count_records(path2) == len(records)

    def test_corrupt_crc_detected(self, tmp_path):
        mod = self._native()
        path = str(tmp_path / "bad.tfrecords")
        mod.write_records(path, [b"payload"])
        raw = bytearray(open(path, "rb").read())
        raw[-6] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(OSError):
            mod.read_all_records(path, True)

    def test_truncated_file_detected_all_paths(self, tmp_path):
        """EOF mid-record (partially written file) must raise, not be
        treated as clean EOF — in the native reader/counter AND the
        pure-python fallbacks (which also used to count the phantom
        trailing record)."""
        import hemx.data.tfrecord as T
        mod = self._native()
        path = str(tmp_path / "trunc.tfrecords")
        mod.write_records(path, [b"a" * 100] * 3)
        full = open(path, "rb").read()
        open(path, "wb").write(full[:-30])
        with pytest.raises(OSError, match="[Tt]runcated"):
            mod.read_all_records(path, False)
        with pytest.raises(OSError, match="[Tt]runcated"):
            mod.count_records(path)
        with pytest.raises(OSError, match="truncated"):
            list(T.tfrecord_iterator(path))
        orig = T._native
        T._native = lambda: None
        try:
            with pytest.raises(OSError, match="truncated"):
                T.count_records(path)
        finally:
            T._native = orig

    def test_garbage_length_header_raises(self, tmp_path):
        """A corrupt on-disk length (unchecked when verify=0) must raise,
        not allocate: 2^60 used to std::bad_alloc inside the no-GIL region
        (-> process abort) and a >=2^63 length wrapped count_records'
        signed end-offset negative, silently returning a partial count."""
        mod = self._native()
        path = str(tmp_path / "garbage.tfrecords")
        for bad_len in (1 << 60, (1 << 63) + 5):
            with open(path, "wb") as f:
                f.write(struct.pack("<Q", bad_len) + b"\x00" * 4 + b"tail")
            with pytest.raises(OSError, match="[Tt]runcated"):
                mod.read_all_records(path, False)
            with pytest.raises(OSError, match="[Tt]runcated"):
                mod.count_records(path)

    def test_short_write_raises(self, tmp_path):
        """write_records must report I/O failure (ENOSPC etc.), not return
        success over a truncated file — exercised via /dev/full where
        available."""
        mod = self._native()
        if not os.path.exists("/dev/full"):
            pytest.skip("/dev/full unavailable")
        with pytest.raises(OSError):
            mod.write_records("/dev/full", [b"x" * 65536] * 64)


class TestMoments:
    def test_moments_summary(self, tmp_path):
        w = EventsWriter(str(tmp_path))
        batch = np.random.default_rng(0).random((16, 8, 8, 3)).astype(np.float32)
        w.moments("distribution", batch, 3)
        w.close()
        from hemx.summaries.reader import get_all_events
        tags = set(get_all_events(str(tmp_path)))
        assert {"distribution/mean", "distribution/variance"} <= tags


class TestPerLayerInstrumentation:
    """--summarize_activations / --summarize_gradients (reference per-layer
    vocabulary: hem/ops/layers.py:121-131, hem/ops/summaries.py:64-75) and
    histogram-plot rendering (hem/util/events.py:120-205)."""

    def _cnn(self):
        import jax
        from tests.conftest import make_args
        from hemx.data.synthetic import SyntheticDataset
        from hemx.models.plugin import get_model
        from hemx.parallel.mesh import make_mesh
        from hemx.parallel.dp import shard_batch
        args = make_args(model="cnn", batch_size=2)
        mesh = make_mesh(0)
        splits = SyntheticDataset.get_datasets(args)
        model = get_model("cnn")(args, mesh)
        gb = args.batch_size * mesh.size
        host = next(splits["train"].iter_epoch(gb, shuffle=False))
        ts = model.init_state(jax.random.PRNGKey(0), host)
        return model, ts, shard_batch({"image": host["image"]}, mesh)

    def test_activation_and_gradient_tags(self, tmp_path):
        from hemx.models import common
        from hemx.summaries.reader import (get_all_events,
                                           get_histogram_tags)
        model, ts, batch = self._cnn()
        acts = model.capture_activations(ts, batch)
        grads = model.grad_report(ts, batch)
        assert acts and grads
        w = EventsWriter(str(tmp_path))
        common.write_stat_summaries(w, 1, acts, "activations")
        common.write_stat_summaries(w, 1, grads, "gradients")
        w.close()
        scalars = set(get_all_events(str(tmp_path)))
        histos = set(get_histogram_tags(str(tmp_path)))
        # per-layer outputs of the first encoder conv must be present
        assert any(t.startswith("activations/") and t.endswith("c1/mean")
                   for t in scalars)
        assert any(t.startswith("activations/") and
                   t.endswith("c1/zero_fraction") for t in scalars)
        assert any(t.startswith("gradients/") and t.endswith("/mean")
                   for t in scalars)
        assert any(t.startswith("activations/") for t in histos)
        assert any(t.startswith("gradients/") for t in histos)

    def test_histogram_plot_renders(self, tmp_path):
        import numpy as _np
        from hemx.summaries.reader import (get_histogram_plot_data,
                                           render_histogram_plot)
        w = EventsWriter(str(tmp_path))
        rng = _np.random.default_rng(0)
        for step in range(5):
            w.histogram("weights/w", rng.normal(scale=1 + step, size=4096),
                        step)
        w.close()
        steps, series = get_histogram_plot_data(str(tmp_path), "weights/w")
        assert steps == [0, 1, 2, 3, 4]
        # the spread should widen with the growing scale
        assert (series[93][4] - series[7][4]) > (series[93][0] - series[7][0])
        # median of a zero-mean normal stays near 0
        assert abs(series[50][0]) < 0.2
        out = render_histogram_plot(str(tmp_path), "weights/w",
                                    str(tmp_path / "h.png"))
        import os as _os
        assert _os.path.getsize(out) > 1000


class TestWebGui:
    """The --serve frontend's pure pieces: run/index HTML generation, image
    round-trip through the reader, and chart/histogram PNG rendering."""

    @pytest.fixture()
    def run_dir(self, tmp_path):
        run = tmp_path / "myrun"
        (run / "train").mkdir(parents=True)
        (run / "options.config").write_text("model cnn\n")
        w = EventsWriter(str(run / "train"))
        for step in (1, 2, 3):
            w.scalar("losses/loss", 1.0 / step, step)
            w.histogram("acts/h", np.random.default_rng(step).normal(size=64),
                        step)
        img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(
            np.uint8)
        w.image("examples/out", img, 3)
        w.close()
        return str(run)

    def test_reader_image_roundtrip(self, run_dir):
        from hemx.summaries.reader import get_image_tags, get_image_values
        logdir = os.path.join(run_dir, "train")
        assert get_image_tags(logdir) == ["examples/out"]
        rows = get_image_values(logdir, "examples/out")
        assert [s for s, _ in rows] == [3]
        decoded = decode_png(rows[0][1])
        assert decoded.shape == (8, 8, 3)

    def test_html_pages(self, run_dir):
        import visualize_gui as gui
        idx = gui.index_html([run_dir])
        assert "/run/0" in idx and "myrun" in idx
        page = gui.run_html(0, run_dir)
        assert "losses/loss" in page and "examples/out" in page
        assert "acts/h" in page
        gallery = gui.images_html(0, run_dir, "train", "examples/out")
        assert "step 3" in gallery and "/image.png?" in gallery

    def test_chart_renderers(self, run_dir):
        import visualize_gui as gui
        png = gui.render_scalar_png(run_dir, "train", "losses/loss")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        png = gui.render_histogram_png(run_dir, "train", "acts/h")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


def _load_parity_report():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "parity_report", os.path.join(
            os.path.dirname(__file__), "..", "scripts", "parity_report.py"))
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)
    return pr


class TestElapsedSeconds:
    def test_adaptive_gap_counts_slow_spans(self, tmp_path):
        """A span below 10x the run's median cadence is legitimate slow
        training (long jit compile, slow epoch) and must be counted; only
        true pauses (here a 2 h gap) are dropped. The old fixed-600s
        threshold silently dropped the 900 s span, understating training
        time and flattering the speedup column (ADVICE r3)."""
        from hemx.summaries import proto
        pr = _load_parity_report()
        run = tmp_path / "cnn" / "train"
        w = EventsWriter(str(run))
        t0 = 1_000_000.0
        offs = [0, 400, 800, 1700, 2100, 2100 + 7200, 2100 + 7200 + 400]
        for i, off in enumerate(offs):
            w._write_event(proto.event(t0 + off, i, summary_bytes=proto.summary(
                [proto.summary_value_scalar("losses/loss", 1.0)])))
        w.close()
        el, paused = pr.elapsed_seconds("cnn", base=str(tmp_path))
        # deltas 400,400,900,400,7200,400; median 400 -> gap threshold 4000:
        # everything but the 7200 s pause counts
        assert el == 2500
        assert paused is True


class TestSampleStatistics:
    def test_report_rows_from_histograms(self, tmp_path):
        """parity_report.sample_statistics derives fake/real pixel mean, std
        and histogram TVD at epoch boundaries from the fakes_hist/real_hist
        summaries (BASELINE.md 'sample-statistics parity')."""
        pr = _load_parity_report()

        rng = np.random.default_rng(0)
        real = rng.uniform(0.2, 0.8, size=20000).astype(np.float32)
        run = tmp_path / "iwgan" / "train"
        w = EventsWriter(str(run))
        for ep in (10, 50, 100):
            step = ep * 32
            # fakes start broad, converge toward the real distribution
            spread = {10: 1.0, 50: 0.5, 100: 0.02}[ep]
            fake = np.clip(real + rng.normal(0, spread, real.shape), 0, 1)
            w.histogram("examples/fakes_hist", fake.astype(np.float32), step)
            w.histogram("examples/real_hist", real, step)
        w.close()

        rows = pr.sample_statistics("iwgan", base=str(tmp_path))
        assert [r["epoch"] for r in rows] == [10, 50, 100]
        for r in rows:
            np.testing.assert_allclose(r["real_mean"], real.mean(), rtol=1e-5)
            np.testing.assert_allclose(r["real_std"], real.std(), rtol=1e-4)
            assert 0.0 <= r["tvd"] <= 1.0
        # convergence is visible: TVD shrinks monotonically toward 0
        tvds = [r["tvd"] for r in rows]
        assert tvds[0] > tvds[1] > tvds[2]
        assert tvds[2] < 0.2
        # a run that never reached epoch 50 yields only the epochs it hit
        short = pr.sample_statistics("iwgan", target_epochs=(10, 50, 200),
                                     base=str(tmp_path))
        assert [r["epoch"] for r in short] == [10, 50]
        # absent run -> no rows
        assert pr.sample_statistics("missing", base=str(tmp_path)) == []

    def test_duplicate_steps_pair_post_resume_rows(self, tmp_path):
        """After a crash-restart re-writes an overlapping step into a second
        tfevents file, fake and real histograms at that step must BOTH come
        from the post-resume file — never a pre-crash fake paired with a
        post-resume real (ADVICE r3)."""
        pr = _load_parity_report()

        run = tmp_path / "gan" / "train"
        step = 10 * 32
        pre = np.full(4096, 0.2, np.float32)    # pre-crash attempt
        post = np.full(4096, 0.8, np.float32)   # post-resume attempt
        w = EventsWriter(str(run), filename_suffix="a")
        w.histogram("examples/fakes_hist", pre, step)
        w.histogram("examples/real_hist", pre, step)
        w.close()
        w = EventsWriter(str(run), filename_suffix="b")  # sorts after "a"
        w.histogram("examples/fakes_hist", post, step)
        w.histogram("examples/real_hist", post, step)
        w.close()

        rows = pr.sample_statistics("gan", target_epochs=(10,),
                                    base=str(tmp_path))
        assert len(rows) == 1
        # both sides resolve to the LAST (post-resume) occurrence: means
        # match each other and the post values, and TVD is 0
        np.testing.assert_allclose(rows[0]["fake_mean"], 0.8, atol=1e-6)
        np.testing.assert_allclose(rows[0]["real_mean"], 0.8, atol=1e-6)
        assert rows[0]["tvd"] == 0.0


class TestWebGuiServer:
    """In-process drive of the --serve HTTP app (cross-process loopback is
    blocked in this sandbox, so client and server share the process)."""

    @pytest.fixture(scope="class")
    def server(self, tmp_path_factory):
        import threading
        import visualize_gui as gui

        ws = tmp_path_factory.mktemp("guiws")
        run = ws / "myrun"
        (run / "options.config").parent.mkdir(parents=True, exist_ok=True)
        (run / "options.config").write_text("model cnn\n")
        w = EventsWriter(str(run / "train"))
        w.scalar("losses/loss", 0.5, 1)
        w.scalar("losses/loss", 0.25, 2)
        w.histogram("acts/h", np.random.default_rng(0).normal(size=512), 2)
        w.close()
        # port 0 = ephemeral (a hardcoded port collides across suite runs);
        # the bound server IS readiness — no sleep race — and teardown
        # shuts it down instead of leaking a daemon thread
        httpd, _ = gui.make_server(str(ws), 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield httpd.server_address[1]
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=10)

    def _get(self, port, path):
        import urllib.request, urllib.error
        try:
            r = urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=30)
            return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    def test_routing_and_404s(self, server):
        code, body = self._get(server, "/")
        assert code == 200 and b"/run/0" in body
        code, body = self._get(server, "/run/0")
        assert code == 200 and b"losses/loss" in body
        # negative and out-of-range indices must 404, not resolve or 500
        assert self._get(server, "/run/-1")[0] == 404
        assert self._get(server, "/run/99")[0] == 404
        assert self._get(server, "/chart?run=-1&phase=train&tag=x")[0] == 404
        assert self._get(server, "/nope")[0] == 404

    def test_client_errors_are_404_not_500(self, server):
        """Non-integer run values and missing query params are client
        errors; they must 404 via _NotFound, not fall into the generic
        500 handler (ADVICE r3)."""
        assert self._get(server, "/run/abc")[0] == 404
        assert self._get(server, "/chart?run=abc&phase=train&tag=x")[0] == 404
        assert self._get(server, "/chart")[0] == 404        # no params at all
        assert self._get(server, "/chart?run=0")[0] == 404  # missing phase/tag
        assert self._get(server, "/images?run=0&phase=train")[0] == 404
        assert self._get(
            server, "/image.png?run=0&phase=train&tag=x&step=zz")[0] == 404
        # an unknown/stale step must 404, not return a 200 empty png body
        assert self._get(
            server, "/image.png?run=0&phase=train&tag=x&step=999")[0] == 404

    def test_concurrent_chart_renders(self, server):
        """Chart endpoints render via the OO matplotlib API; concurrent
        requests from server worker threads must all yield valid PNGs."""
        import threading
        out = []
        path = "/chart?run=0&phase=train&tag=losses%2Floss"
        hpath = "/hist?run=0&phase=train&tag=acts%2Fh"
        def hit(p):
            out.append(self._get(server, p))
        ts = [threading.Thread(target=hit, args=(p,))
              for p in [path, hpath] * 3]
        [t.start() for t in ts]; [t.join() for t in ts]
        assert len(out) == 6
        for code, body in out:
            assert code == 200
            assert body[:8] == b"\x89PNG\r\n\x1a\n"
