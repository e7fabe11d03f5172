"""Serving daemon (seld_tpu.serving + scripts/serve.py).

The reference deploys by importing the model zoo into a live TF process;
the TPU-native deployment is export once -> serve the artifact from a
process with no model code. These pin the daemon half: npy/npz wire
format, session lifecycle, error surfacing, numerics vs the live model.
"""
import os
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.models import build_model
from seld_tpu.serving import SELDServer, serve
from seld_tpu.serving.client import SELDClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "FIRST": "simple_conv_block",
    "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
    "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
    "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
    "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    "n_classes": 4,
}


def _tiny_window_artifact(tmp_path):
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model = build_model("seldnet", (50, 16, 7), TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    path = save_exported(export_window_forward(model, variables, (50, 16, 7)),
                         str(tmp_path / "tiny.shlo"),
                         extra_meta={"unit": "window"})
    return model, variables, path


class _Daemon:
    """In-process server on an ephemeral port, shut down on exit."""

    def __init__(self, service):
        self.service = service
        self.httpd = serve(service, "127.0.0.1", 0)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    def __enter__(self):
        return SELDClient("127.0.0.1", self.port, timeout=120)

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.service.close()
        self.thread.join(timeout=10)


def test_serve_score_window_artifact(tmp_path):
    model, variables, path = _tiny_window_artifact(tmp_path)
    with _Daemon(SELDServer(artifact=path)) as client:
        h = client.health()
        assert h["status"] == "ok" and h["units"] == ["window"]
        x = np.random.RandomState(0).randn(3, 50, 16, 7).astype(np.float32)
        sed, doa = client.score(x)
        want_sed, want_doa = model.apply(variables, jnp.asarray(x),
                                         train=False)
        np.testing.assert_allclose(sed, np.asarray(want_sed),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(doa, np.asarray(want_doa),
                                   rtol=1e-6, atol=1e-6)

        # errors surface as structured HTTP failures, not hung sockets
        with pytest.raises(RuntimeError, match="404"):
            client.stream_push("s0", x)          # no bundle loaded
        with pytest.raises(RuntimeError, match="400"):
            client._request("POST", "/v1/score", b"not an npy")
        with pytest.raises(RuntimeError, match="400"):
            client.score(np.zeros((3, 50, 16, 5), np.float32))  # bad shape
        # the daemon is still healthy after the failures
        assert client.health()["status"] == "ok"


def test_serve_bf16_artifact_wire_format(tmp_path):
    """bf16 artifacts are servable: npy can't self-describe ml_dtypes, so
    the client ships the uint16 bit view + X-SELD-Dtype header; f32 clients
    are value-cast server-side to the exported input dtype."""
    import ml_dtypes
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model = build_model("seldnet", (50, 16, 7), TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    path = save_exported(
        export_window_forward(model, variables, (50, 16, 7),
                              dtype=jnp.bfloat16),
        str(tmp_path / "tiny_bf16.shlo"), extra_meta={"unit": "window"})

    xf = np.random.RandomState(0).randn(3, 50, 16, 7).astype(np.float32)
    xb = xf.astype(ml_dtypes.bfloat16)
    want_sed, want_doa = model.apply(variables, jnp.asarray(xb), train=False)
    with _Daemon(SELDServer(artifact=path)) as client:
        sed, doa = client.score(xb)          # bf16 wire: bit view + header
        np.testing.assert_allclose(sed, np.asarray(want_sed), atol=1e-6)
        np.testing.assert_allclose(doa, np.asarray(want_doa), atol=1e-6)
        sed2, doa2 = client.score(xf)        # f32 client, bf16 artifact
        np.testing.assert_allclose(sed2, sed, atol=1e-6)
        np.testing.assert_allclose(doa2, doa, atol=1e-6)
        # a raw void body (header-less bf16 save) still errors cleanly
        import io as _io
        buf = _io.BytesIO()
        with np.testing.suppress_warnings() as sup:
            sup.filter(UserWarning)
            np.save(buf, xb)
        with pytest.raises(RuntimeError, match="400"):
            client._request("POST", "/v1/score", buf.getvalue())
        assert client.health()["status"] == "ok"


def test_serve_microbatch_coalesces(tmp_path):
    """batch_window_ms > 0: concurrent /v1/score requests coalesce into one
    device dispatch (row-concatenated), each response still matching the
    live model; health reports the coalescing stats."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    svc = SELDServer(artifact=path, batch_window_ms=1.0, max_batch=64)
    with _Daemon(svc) as client:
        # warm the artifact so coalescing isn't skewed by compile time
        client.score(np.zeros((1, 50, 16, 7), np.float32))
        rng = np.random.RandomState(0)
        xs = [rng.randn(n, 50, 16, 7).astype(np.float32)
              for n in (1, 2, 3, 1)]
        got = [None] * len(xs)

        def post(i):
            got[i] = client.score(xs[i])

        # deterministic coalescing: hold the dispatch lock so the batcher
        # blocks on the first drained batch while the rest pile into the
        # queue. The batcher greedy-drains BEFORE taking the lock, so queue
        # depth is not observable (on a loaded host all 4 can enqueue before
        # it wakes and drain into ONE batch, leaving qsize at 0) — count
        # enqueues at the source instead.
        q = svc._queue
        enqueued = []
        orig_put = q.put

        def counting_put(item, *a, **kw):
            # put FIRST, count after it returns: counting before the put
            # lets the wait loop below release the dispatch lock while an
            # item is counted but not yet physically in the queue, and the
            # batcher may then split the stragglers into an extra dispatch
            r = orig_put(item, *a, **kw)
            if item is not None:
                enqueued.append(item)
            return r

        q.put = counting_put
        try:
            threads = [threading.Thread(target=post, args=(i,))
                       for i in range(len(xs))]
            with svc._dispatch_lock:
                for t in threads:
                    t.start()
                # Generous wait: on a loaded 1-core host the 4 HTTP threads
                # can take a while
                for _ in range(6000):
                    if len(enqueued) >= len(xs):
                        break
                    time.sleep(0.01)
                else:
                    raise AssertionError("requests never queued")
        finally:
            q.put = orig_put
        for t in threads:
            t.join(timeout=120)
        for i, x in enumerate(xs):
            want_sed, want_doa = model.apply(variables, jnp.asarray(x),
                                             train=False)
            np.testing.assert_allclose(got[i][0], np.asarray(want_sed),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(got[i][1], np.asarray(want_doa),
                                       rtol=1e-6, atol=1e-6)
        b = client.health()["batching"]
        assert b["requests"] == 5 and b["rows"] == 8
        # request 1 dispatched solo; 2-4 coalesced: 3 dispatches for 5
        assert b["dispatches"] < b["requests"]

        # a bare window (no batch dim) is accepted on the batched path
        sed, _ = client.score(xs[0][0])
        assert sed.shape[0] == 1
        # bad per-window shape fails per-request, served batch unaffected
        with pytest.raises(RuntimeError, match="400"):
            client.score(np.zeros((2, 50, 16, 5), np.float32))
        # empty batch is a clean 400, not a device error
        with pytest.raises(RuntimeError, match="400"):
            client.score(np.zeros((0, 50, 16, 7), np.float32))
        assert client.health()["status"] == "ok"


def test_serve_microbatch_chunks_oversized_request(tmp_path):
    """A single request larger than max_batch chunks at max_batch (compile
    variants stay bounded by the bucket cap) and returns exact results."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    svc = SELDServer(artifact=path, batch_window_ms=1.0, max_batch=4)
    with _Daemon(svc) as client:
        x = np.random.RandomState(1).randn(10, 50, 16, 7).astype(np.float32)
        sed, doa = client.score(x)               # chunks: 4 + 4 + 2(pad->2)
        want_sed, want_doa = model.apply(variables, jnp.asarray(x),
                                         train=False)
        np.testing.assert_allclose(sed, np.asarray(want_sed),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(doa, np.asarray(want_doa),
                                   rtol=1e-6, atol=1e-6)
        b = client.health()["batching"]
        assert b["requests"] == 1 and b["rows"] == 10 and b["dispatches"] == 3


def test_serve_microbatch_static_artifact_pads(tmp_path):
    """With batching on, a STATIC-batch artifact serves ANY request size:
    coalesced rows are padded-and-chunked to the exported batch."""
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model = build_model("seldnet", (50, 16, 7), TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    path = save_exported(
        export_window_forward(model, variables, (50, 16, 7), batch=4),
        str(tmp_path / "tiny_b4.shlo"), extra_meta={"unit": "window"})

    with _Daemon(SELDServer(artifact=path, batch_window_ms=20.0)) as client:
        for n in (2, 5, 4):                    # under, over, exactly 4
            x = np.random.RandomState(n).randn(n, 50, 16, 7).astype(
                np.float32)
            sed, doa = client.score(x)
            want_sed, want_doa = model.apply(variables, jnp.asarray(x),
                                             train=False)
            np.testing.assert_allclose(sed, np.asarray(want_sed),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(doa, np.asarray(want_doa),
                                       rtol=1e-5, atol=1e-5)


def test_serve_requires_a_unit():
    with pytest.raises(ValueError):
        SELDServer()


@pytest.mark.heavy
def test_serve_streaming_sessions(tmp_path):
    """Two interleaved live sessions over one bundle: emitted frames match
    the live engine, finalize frees the session, short clips give 400."""
    from seld_tpu.config import get_model_config
    from seld_tpu.inference.export import export_streaming
    from seld_tpu.inference.streaming import StreamingSELD

    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    model = build_model("conv_temporal", (50, 16, 7), cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 50, 16, 7)), train=False)
    bundle = export_streaming(model.apply, variables, (16, 7),
                              str(tmp_path / "bundle"),
                              win_size=50, step_size=5, time_down=5, chunk=4)

    live = StreamingSELD(model.apply, variables, feat_shape=(16, 7),
                         win_size=50, step_size=5, time_down=5, chunk=4)
    rng = np.random.RandomState(2)
    xa = rng.randn(200, 16, 7).astype(np.float32)
    xb = rng.randn(200, 16, 7).astype(np.float32)

    def live_frames(x):
        live.reset()
        out = []
        for lo in range(0, 200, 40):
            out.extend(live.push(x[lo:lo + 40]))
        out.extend(live.finalize())
        return out

    want_a, want_b = live_frames(xa), live_frames(xb)

    with _Daemon(SELDServer(bundle=bundle)) as client:
        got = {"a": [], "b": []}
        for lo in range(0, 200, 40):       # interleaved pushes
            for sid, x in (("a", xa), ("b", xb)):
                sed, doa = client.stream_push(sid, x[lo:lo + 40])
                got[sid].extend(zip(sed, doa))
        assert client.health()["sessions"] == 2
        for sid in ("a", "b"):
            sed, doa = client.stream_finalize(sid)
            got[sid].extend(zip(sed, doa))
        assert client.health()["sessions"] == 0

        for got_s, want_s in ((got["a"], want_a), (got["b"], want_b)):
            assert len(got_s) == len(want_s) == 40
            for (se, de), (sl, dl) in zip(got_s, want_s):
                np.testing.assert_allclose(se, np.asarray(sl), atol=1e-5)
                np.testing.assert_allclose(de, np.asarray(dl), atol=1e-5)

        # short clip: exported engines refuse finalize -> clean 400
        client.stream_push("short", xa[:40])
        with pytest.raises(RuntimeError, match="400"):
            client.stream_finalize("short")
        assert client.stream_drop("short") is True
        assert client.stream_drop("short") is False


@pytest.mark.slow
def test_serve_cli(tmp_path):
    """CLI journey: scripts/serve.py --artifact --warmup, score over HTTP
    from a separate process, clean shutdown."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts/serve.py"),
         "--artifact", path, "--port", "0", "--warmup"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
    try:
        port = None
        for _ in range(600):
            line = proc.stdout.readline()
            if "serving" in line:
                port = int(line.rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        client = SELDClient("127.0.0.1", port, timeout=300)
        x = np.random.RandomState(0).randn(2, 50, 16, 7).astype(np.float32)
        sed, doa = client.score(x)
        want_sed, _ = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(sed, np.asarray(want_sed),
                                   rtol=1e-6, atol=1e-6)
        assert client.health()["units"] == ["window"]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_serve_cli_warmup_buckets_skips_clip_unit(tmp_path):
    """--warmup_buckets applies to window slots only: a mixed window+clip
    deployment must still bind (a clip artifact has no batch axis to
    bucket — bucketing it used to 400 out of main() before the daemon
    ever bound)."""
    from jax import export as jexport
    from seld_tpu.inference.export import save_exported

    model, variables, wpath = _tiny_window_artifact(tmp_path)

    def clip_like(x):                       # [50, 16, 7] -> per-clip labels
        s, d = model.apply(variables, x[None], train=False)
        return s[0], d[0]

    cpath = save_exported(
        jexport.export(jax.jit(clip_like))(
            jax.ShapeDtypeStruct((50, 16, 7), jnp.float32)),
        str(tmp_path / "clip.shlo"), extra_meta={"unit": "clip"})

    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts/serve.py"),
         "--artifact", wpath, "--model", f"clips={cpath}",
         "--batch_window_ms", "1", "--warmup", "--warmup_buckets", "2",
         "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
    try:
        port, saw_skip = None, False
        for _ in range(600):
            line = proc.stdout.readline()
            if "--warmup_buckets skipped" in line:
                saw_skip = True
            if "serving" in line:
                port = int(line.rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        assert saw_skip, "clip slot should report the bucket skip"
        client = SELDClient("127.0.0.1", port, timeout=300)
        x = np.random.RandomState(0).randn(50, 16, 7).astype(np.float32)
        sed, _ = client.score(x, model="clips")
        want_sed, _ = model.apply(variables, jnp.asarray(x[None]),
                                  train=False)
        np.testing.assert_allclose(sed, np.asarray(want_sed)[0],
                                   rtol=1e-6, atol=1e-6)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.heavy
def test_serve_spmd_artifact(tmp_path):
    """The daemon serves a mesh-sharded (SPMD) window artifact: requests
    are device_put over the artifact's mesh, buckets pad to mesh-divisible
    sizes, and outputs match the single-device model."""
    from jax.sharding import Mesh
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)

    model = build_model("seldnet", (50, 16, 7), TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 50, 16, 7)), train=False)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = mesh.devices.size
    path = save_exported(
        export_window_forward(model, variables, (50, 16, 7),
                              batch=2 * n, mesh=mesh),
        str(tmp_path / "tiny_spmd.shlo"), extra_meta={"unit": "window"})

    svc = SELDServer(artifact=path, batch_window_ms=1.0, max_batch=64)
    assert svc.nr_devices == n
    with _Daemon(svc) as client:
        rng = np.random.RandomState(0)
        for b in (1, 3, 2 * n):     # static SPMD artifact: pad-and-chunk
            x = rng.randn(b, 50, 16, 7).astype(np.float32)
            sed, doa = client.score(x)
            want_sed, want_doa = model.apply(variables, jnp.asarray(x),
                                             train=False)
            np.testing.assert_allclose(sed, np.asarray(want_sed),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(doa, np.asarray(want_doa),
                                       rtol=1e-5, atol=1e-5)


def test_serve_metrics_endpoint(tmp_path):
    """GET /metrics: Prometheus text with per-route counters, latency
    histogram sums/counts, batch counters, and the session gauge."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    with _Daemon(SELDServer(artifact=path, batch_window_ms=1.0)) as client:
        x = np.random.RandomState(0).randn(2, 50, 16, 7).astype(np.float32)
        client.score(x)
        client.score(x)
        with pytest.raises(RuntimeError, match="400"):
            client.score(np.zeros((1, 50, 16, 5), np.float32))
        text = client.metrics()
        assert 'seld_requests_total{route="/v1/score",code="200"} 2' in text
        assert 'seld_requests_total{route="/v1/score",code="400"} 1' in text
        assert 'seld_request_seconds_count{route="/v1/score"} 3' in text
        assert 'le="+Inf"} 3' in text
        # model names are label VALUES (metric names must stay
        # [a-zA-Z_:][a-zA-Z0-9_:]* — a name like "ss5-int8" would break
        # the whole exposition if interpolated into the metric name)
        assert 'seld_batch_requests_total{model="default"} 2' in text
        assert "seld_stream_sessions 0" in text
        # scraping /metrics is itself counted on the next scrape
        text2 = client.metrics()
        assert 'seld_requests_total{route="/metrics",code="200"} 1' in text2


def test_serve_multi_model_routing_and_reload(tmp_path):
    """Named artifacts route by ?model=, /v1/models lists them, and
    /v1/reload hot-swaps a re-exported artifact without a restart."""
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model_a, var_a, path_a = _tiny_window_artifact(tmp_path)
    model_b = build_model("seldnet", (50, 16, 7), TINY)
    var_b = model_b.init({"params": jax.random.PRNGKey(7)},
                         jnp.zeros((1, 50, 16, 7)), train=False)
    path_b = str(tmp_path / "b.shlo")
    save_exported(export_window_forward(model_b, var_b, (50, 16, 7)),
                  path_b, extra_meta={"unit": "window"})

    svc = SELDServer(artifact=path_a, artifacts={"b": path_b},
                     batch_window_ms=1.0)
    with _Daemon(svc) as client:
        x = np.random.RandomState(0).randn(2, 50, 16, 7).astype(np.float32)
        want_a = model_a.apply(var_a, jnp.asarray(x), train=False)
        want_b = model_b.apply(var_b, jnp.asarray(x), train=False)

        # default route serves --artifact; ?model=b routes to the named one
        sed, _ = client.score(x)
        np.testing.assert_allclose(sed, np.asarray(want_a[0]),
                                   rtol=1e-6, atol=1e-6)
        sed_b, _ = client.score(x, model="b")
        np.testing.assert_allclose(sed_b, np.asarray(want_b[0]),
                                   rtol=1e-6, atol=1e-6)
        assert np.abs(sed - sed_b).max() > 1e-4  # actually different models

        models = client.models()
        assert set(models) == {"default", "b"}
        assert models["default"]["default"] and not models["b"]["default"]
        assert models["b"]["unit"] == "window"
        assert set(client.health()["models"]) == {"default", "b"}

        # unknown model is a clean 404
        with pytest.raises(RuntimeError, match="404"):
            client.score(x, model="nope")

        # hot reload: re-export DIFFERENT weights (var_a) to the SAME path,
        # then POST /v1/reload — responses flip to the new weights without
        # a restart
        save_exported(export_window_forward(model_a, var_a, (50, 16, 7)),
                      path_b, extra_meta={"unit": "window"})
        rep = client.reload()
        assert set(rep) == {"default", "b"}
        # 'changed' is content-hash based: retrained weights flip it even
        # when the artifact byte count is identical (same architecture,
        # same-sized constants), and the untouched default reports False
        assert rep["b"]["changed"] is True
        assert rep["default"]["changed"] is False
        sed_b2, _ = client.score(x, model="b")
        np.testing.assert_allclose(sed_b2, np.asarray(want_a[0]),
                                   rtol=1e-6, atol=1e-6)
        assert client.health()["status"] == "ok"


def test_serve_single_named_model_is_default(tmp_path):
    """With only --model NAME=PATH (no --artifact) the bare /v1/score route
    serves the unambiguous single model."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    svc = SELDServer(artifacts={"only": path})
    with _Daemon(svc) as client:
        x = np.random.RandomState(1).randn(1, 50, 16, 7).astype(np.float32)
        sed, _ = client.score(x)
        want = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(sed, np.asarray(want[0]),
                                   rtol=1e-6, atol=1e-6)
        assert client.models()["only"]["default"]


def test_serve_reload_all_or_nothing(tmp_path):
    """/v1/reload validates EVERY artifact before publishing ANY: a corrupt
    file for model b must not leave model a silently serving new weights
    behind the 500."""
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model_a, var_a, path_a = _tiny_window_artifact(tmp_path)
    var_b = model_a.init({"params": jax.random.PRNGKey(7)},
                         jnp.zeros((1, 50, 16, 7)), train=False)
    path_b = str(tmp_path / "b.shlo")
    save_exported(export_window_forward(model_a, var_b, (50, 16, 7)),
                  path_b, extra_meta={"unit": "window"})

    svc = SELDServer(artifact=path_a, artifacts={"b": path_b})
    with _Daemon(svc) as client:
        x = np.random.RandomState(0).randn(1, 50, 16, 7).astype(np.float32)
        want_a = np.asarray(model_a.apply(var_a, jnp.asarray(x),
                                          train=False)[0])
        want_b = np.asarray(model_a.apply(var_b, jnp.asarray(x),
                                          train=False)[0])

        # re-export a's file with b's weights, corrupt b's file
        save_exported(export_window_forward(model_a, var_b, (50, 16, 7)),
                      path_a, extra_meta={"unit": "window"})
        with open(path_b, "wb") as f:
            f.write(b"not a stablehlo artifact")
        with pytest.raises(RuntimeError,
                           match="500.*no artifacts were swapped"):
            client.reload()
        # default still serves the OLD weights (a's swap was rolled up
        # into the failed transaction, not silently committed)
        sed, _ = client.score(x)
        np.testing.assert_allclose(sed, want_a, rtol=1e-6, atol=1e-6)

        # restore b and reload: now BOTH swap in one transaction
        save_exported(export_window_forward(model_a, var_a, (50, 16, 7)),
                      path_b, extra_meta={"unit": "window"})
        rep = client.reload()
        assert rep["default"]["changed"] and rep["b"]["changed"]
        sed, _ = client.score(x)
        np.testing.assert_allclose(sed, want_b, rtol=1e-6, atol=1e-6)
        sed_b, _ = client.score(x, model="b")
        np.testing.assert_allclose(sed_b, want_a, rtol=1e-6, atol=1e-6)


def test_serve_model_name_needing_url_quoting(tmp_path):
    """Model names round-trip through the query string URL-encoded: a name
    with a space (or '+', '&') must reach the server verbatim."""
    model, variables, path = _tiny_window_artifact(tmp_path)
    svc = SELDServer(artifacts={"ss5 v2+final": path})
    with _Daemon(svc) as client:
        x = np.random.RandomState(1).randn(1, 50, 16, 7).astype(np.float32)
        sed, _ = client.score(x, model="ss5 v2+final")
        want = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(sed, np.asarray(want[0]),
                                   rtol=1e-6, atol=1e-6)
        # metrics stay parseable: the name travels as a label VALUE
        text = client.metrics()
        assert 'model="ss5 v2+final"' in text
        assert "seld_batch_requests_total{" in text


def test_serve_reload_refuses_unit_change(tmp_path):
    """Hot reload guards against swapping a window artifact for a clip one
    (the batcher is wired per unit); the old artifact keeps serving."""
    from seld_tpu.inference.export import (export_window_forward,
                                           save_exported)
    model, variables, path = _tiny_window_artifact(tmp_path)
    svc = SELDServer(artifact=path, batch_window_ms=1.0)
    with _Daemon(svc) as client:
        x = np.random.RandomState(0).randn(1, 50, 16, 7).astype(np.float32)
        client.score(x)
        save_exported(  # same program, declared as a different unit
            export_window_forward(model, variables, (50, 16, 7)),
            path, extra_meta={"unit": "clip"})
        with pytest.raises(RuntimeError, match="500.*unit changed"):
            client.reload()
        sed, _ = client.score(x)      # old window artifact still serves
        assert sed.shape[0] == 1
