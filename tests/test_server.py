"""HTTP serving daemon: endpoint contract, errors, stats, streaming.

Drives a real ThreadingHTTPServer on an ephemeral port with a tiny model —
the same stack `waveglow-tpu serve` runs — through stdlib urllib clients.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from tests.test_serving import TINY, rand_mels, tiny_checkpoint
from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.inference.server import SynthesisService, make_server

BUCKET = 16


@pytest.fixture(scope="module")
def service():
  return SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                          bucket_frames=BUCKET)


@pytest.fixture(scope="module")
def base_url(service):
  httpd = make_server(service, "127.0.0.1", 0)
  thread = threading.Thread(target=httpd.serve_forever, daemon=True)
  thread.start()
  yield f"http://127.0.0.1:{httpd.server_port}"
  httpd.shutdown()
  httpd.server_close()
  thread.join(timeout=10)


def _mel_bytes(frames=10, seed=0):
  buf = io.BytesIO()
  np.save(buf, rand_mels(1, frames, seed=seed)[0], allow_pickle=False)
  return buf.getvalue()


def _post(url, body):
  req = urllib.request.Request(url, data=body, method="POST")
  return urllib.request.urlopen(req, timeout=120)


class TestEndpoints:

  def test_healthz(self, base_url):
    with urllib.request.urlopen(base_url + "/healthz", timeout=30) as r:
      payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["model"]["n_flows"] == 2  # the TINY config
    assert payload["serving"]["bucket_frames"] == BUCKET

  def test_synthesize_returns_playable_wav(self, base_url, service):
    frames = 10
    with _post(base_url + "/synthesize?seed=3", _mel_bytes(frames)) as r:
      assert r.headers["Content-Type"] == "audio/wav"
      sr = int(r.headers["X-Sampling-Rate"])
      body = r.read()
    rate, wav = wavfile.read(io.BytesIO(body))
    assert rate == sr == service.sampling_rate
    assert wav.dtype == np.int16 and wav.shape == (frames * 256,)

  def test_npy_format_matches_direct_library_call(self, base_url, service):
    frames = 11
    url = base_url + "/synthesize?seed=5&format=npy"
    with _post(url, _mel_bytes(frames, seed=5)) as r:
      got = np.load(io.BytesIO(r.read()), allow_pickle=False)
    direct = service.synthesize_mel_packed(rand_mels(1, frames, seed=5)[0],
                                           seed=5)
    np.testing.assert_array_equal(got, direct.samples.astype(np.float32))
    # and the packed path returns the same audio as the classic
    # InferenceResult path (same ops, one fused program)
    classic = service.synthesize_mel(rand_mels(1, frames, seed=5)[0], seed=5)
    np.testing.assert_allclose(got, classic.wav_denoised.astype(np.float32),
                               atol=1e-5)

  def test_synthesize_wav_copy_synthesis(self, base_url, service):
    rng = np.random.default_rng(7)
    audio = (0.3 * rng.standard_normal(4096)).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, service.sampling_rate,
                  (audio * 32767).astype(np.int16))
    with _post(base_url + "/synthesize-wav?seed=2", buf.getvalue()) as r:
      rate, wav = wavfile.read(io.BytesIO(r.read()))
    assert rate == service.sampling_rate
    assert wav.shape[0] > 0

  def test_stream_returns_pcm16_of_full_utterance(self, base_url):
    frames = 12
    url = base_url + "/stream?seed=1&chunk_frames=4"
    with _post(url, _mel_bytes(frames, seed=1)) as r:
      assert r.headers["X-PCM-Format"] == "s16le"
      pcm = r.read()
    samples = np.frombuffer(pcm, dtype="<i2")
    assert samples.shape == (frames * 256,)


class TestErrors:

  def test_garbage_body_is_400(self, base_url):
    with pytest.raises(urllib.error.HTTPError) as e:
      _post(base_url + "/synthesize", b"not an npy file")
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())

  def test_wrong_mel_shape_is_400(self, base_url):
    buf = io.BytesIO()
    np.save(buf, np.zeros((3, 10), np.float32), allow_pickle=False)
    with pytest.raises(urllib.error.HTTPError) as e:
      _post(base_url + "/synthesize", buf.getvalue())
    assert e.value.code == 400
    assert "expected mel [80, frames]" in json.loads(e.value.read())["error"]

  def test_wrong_sample_rate_wav_is_400(self, base_url):
    buf = io.BytesIO()
    wavfile.write(buf, 16000, np.zeros(1600, np.int16))
    with pytest.raises(urllib.error.HTTPError) as e:
      _post(base_url + "/synthesize-wav", buf.getvalue())
    assert e.value.code == 400

  def test_bad_format_is_400(self, base_url):
    with pytest.raises(urllib.error.HTTPError) as e:
      _post(base_url + "/synthesize?format=mp3", _mel_bytes())
    assert e.value.code == 400

  def test_unknown_path_is_404(self, base_url):
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(base_url + "/nope", timeout=30)
    assert e.value.code == 404


class TestStats:

  def test_stats_count_requests_and_audio_seconds(self, base_url, service):
    before = service.snapshot_stats()
    with _post(base_url + "/synthesize?seed=9", _mel_bytes(10, seed=9)) as r:
      r.read()
    after = service.snapshot_stats()
    assert after["requests"] == before["requests"] + 1
    assert after["audio_seconds"] > before["audio_seconds"]
    with urllib.request.urlopen(base_url + "/stats", timeout=30) as r:
      payload = json.loads(r.read())
    assert payload["requests"] == after["requests"]


class TestBucketingOnServer:

  def test_distinct_lengths_share_one_program(self, base_url, service):
    """The serving property that matters on a TPU: requests of different
    lengths inside one bucket reuse a single compiled program."""
    cache_before = service.synth._infer_packed._cache_size()
    for frames, seed in ((9, 1), (13, 2), (16, 3)):
      with _post(base_url + f"/synthesize?seed={seed}",
                 _mel_bytes(frames, seed=seed)) as r:
        r.read()
    assert service.synth._infer_packed._cache_size() <= cache_before + 1


class TestClient:
  """SynthesisClient (stdlib-only) against the live daemon."""

  def test_health_and_stats(self, base_url):
    from waveglow_tpu.inference.client import SynthesisClient
    client = SynthesisClient(base_url)
    assert client.health()["status"] == "ok"
    assert "requests" in client.stats()

  def test_synthesize_matches_direct_call(self, base_url, service):
    from waveglow_tpu.inference.client import SynthesisClient
    client = SynthesisClient(base_url)
    mel = rand_mels(1, 10, seed=21)[0]
    wav = client.synthesize(mel, seed=21)
    direct = service.synthesize_mel_packed(mel, seed=21)
    np.testing.assert_array_equal(wav, direct.samples.astype(np.float32))

  def test_synthesize_to_wav_bytes_is_riff(self, base_url, service):
    from waveglow_tpu.inference.client import SynthesisClient
    client = SynthesisClient(base_url)
    body = client.synthesize_to_wav_bytes(rand_mels(1, 9, seed=22)[0])
    rate, wav = wavfile.read(io.BytesIO(body))
    assert rate == service.sampling_rate and wav.dtype == np.int16

  def test_copy_synthesize(self, base_url, service):
    from waveglow_tpu.inference.client import SynthesisClient
    client = SynthesisClient(base_url)
    rng = np.random.default_rng(23)
    buf = io.BytesIO()
    wavfile.write(buf, service.sampling_rate,
                  (0.2 * rng.standard_normal(4096) * 32767).astype(np.int16))
    wav = client.copy_synthesize(buf.getvalue(), seed=4)
    assert wav.dtype == np.float32 and wav.shape[0] > 0

  def test_stream_pieces_reassemble(self, base_url, service):
    from waveglow_tpu.inference.client import SynthesisClient
    client = SynthesisClient(base_url)
    frames = 12
    mel = rand_mels(1, frames, seed=24)[0]
    pieces = list(client.stream(mel, seed=24, chunk_frames=4))
    assert len(pieces) >= 1
    total = np.concatenate(pieces)
    assert total.shape == (frames * 256,)
    # pieces carry real audio: PCM round trip within 1 LSB of the direct
    # stream output (the server clips int16 responses to [-1, 1] — the toy
    # model overamplifies, so clip the direct floats the same way; /stream
    # denoises by default, so the direct call must too)
    direct = np.concatenate(
        [p for _, p in service.synth.stream(
            mel, seed=24, chunk_frames=4,
            denoiser_strength=service.default_denoiser_strength)])
    # bound: 0.5 LSB rounding + the 32767-encode/32768-decode scale gap
    np.testing.assert_allclose(total, np.clip(direct, -1.0, 1.0),
                               atol=1.6 / 32768)


class TestConcurrency:

  def test_parallel_requests_all_succeed(self, base_url):
    """Concurrent clients queue on the device lock; every request completes
    with a well-formed response (no interleaved/torn device programs)."""
    import concurrent.futures

    def one(seed):
      with _post(base_url + f"/synthesize?seed={seed}&format=npy",
                 _mel_bytes(10, seed=seed)) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
      wavs = list(pool.map(one, range(8)))
    assert all(w.shape == (10 * 256,) for w in wavs)
    # same-seed requests are deterministic even under concurrency
    np.testing.assert_array_equal(one(3), one(3))


class TestMicroBatching:

  def test_requests_arriving_while_busy_batch_together(self, base_url,
                                                       service):
    """Requests that queue up behind a busy device dispatch as ONE batched
    program (stats count them), and every response matches the solo
    serving path for its seed at the micro-batch rounding bound."""
    import concurrent.futures
    import time as _time

    def one(seed):
      with _post(base_url + f"/synthesize?seed={seed}&format=npy",
                 _mel_bytes(10, seed=seed)) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)

    before = service.snapshot_stats()
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=6)
    service._device_lock.acquire()  # hold the device: arrivals accumulate
    try:
      futs = [pool.submit(one, seed) for seed in range(6)]
      _time.sleep(0.8)  # let every request enqueue behind the busy device
    finally:
      service._device_lock.release()
    wavs = [f.result(timeout=120) for f in futs]
    pool.shutdown()

    after = service.snapshot_stats()
    assert after["batched_requests"] - before["batched_requests"] >= 2
    assert after["batches"] - before["batches"] >= 1
    for seed, wav in enumerate(wavs):
      solo = service.synth.infer_serving(rand_mels(1, 10, seed=seed)[0],
                                         seed=seed, bucket_frames=BUCKET)
      np.testing.assert_allclose(wav, solo.samples, atol=1e-5)

  def test_mixed_params_dispatch_as_one_group(self, service):
    """Concurrent requests with different sigma/strength co-batch (per-row
    program inputs) — one fused dispatch, each result matching its solo
    call."""
    from waveglow_tpu.inference.server import _BatchRequest

    # ensure the finisher thread is running (starts on first submit)
    service.synthesize_mel_packed(rand_mels(1, 10, seed=90)[0], seed=90)
    mels = [rand_mels(1, 10, seed=s)[0] for s in (91, 92)]
    reqs = [_BatchRequest(mels[0], 1.0, 0.0005, 91, False),
            _BatchRequest(mels[1], 0.8, 0.002, 92, False)]
    before = service.stats["batches"]
    service._batcher._dispatch(list(reqs))
    for req in reqs:
      assert req.done.wait(timeout=60)
      assert req.error is None
    assert service.stats["batches"] == before + 1  # ONE group, not two
    for req, mel, sg, st, sd in zip(reqs, mels, (1.0, 0.8),
                                    (0.0005, 0.002), (91, 92)):
      solo = service.synth.infer_serving(
          mel, sigma=sg, denoiser_strength=st, seed=sd,
          bucket_frames=service.bucket_frames)
      np.testing.assert_allclose(req.result.samples, solo.samples,
                                 atol=1e-5)

  def test_solo_request_keeps_exact_batch1_contract(self, base_url, service):
    """An uncontended request dispatches immediately through the batch-1
    program — bit-identical to infer_serving."""
    with _post(base_url + "/synthesize?seed=17&format=npy",
               _mel_bytes(10, seed=17)) as r:
      wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
    solo = service.synth.infer_serving(rand_mels(1, 10, seed=17)[0],
                                       seed=17, bucket_frames=BUCKET)
    np.testing.assert_array_equal(wav, solo.samples)


class TestOveramplification:

  def test_int16_responses_clip_instead_of_wrap(self, base_url, service):
    """|sample| > 1 must clip to full scale in int16 responses — plain
    convert_wav WRAPS on overflow (audio turns to noise). The toy model
    overamplifies, making this observable."""
    mel = rand_mels(1, 10, seed=31)[0]
    direct = service.synthesize_mel(mel, seed=31).wav_denoised
    assert np.abs(direct).max() > 1.0  # precondition: the wrap would happen
    with _post(base_url + "/synthesize?seed=31", _mel_bytes(10, seed=31)) as r:
      assert r.headers["X-Overamplified"] == "true"
      rate, wav = wavfile.read(io.BytesIO(r.read()))
    # clipped full-scale, not wrapped into the opposite sign
    peak_idx = int(np.argmax(np.abs(direct)))
    assert abs(int(wav[peak_idx])) == 32767
    assert np.sign(wav[peak_idx]) == np.sign(direct[peak_idx])


class TestAdmissionControl:

  def test_saturated_service_returns_503(self, base_url, service):
    """Past max_queue in-flight requests the daemon sheds with 503 +
    Retry-After instead of queueing unboundedly (saturation is simulated
    by pinning the in-flight counter to the limit)."""
    rejected_before = service.stats["rejected"]
    with service._inflight_lock:
      service._inflight += service.max_queue
    try:
      with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base_url + "/synthesize?seed=60&format=npy", _mel_bytes(10))
      assert exc.value.code == 503
      assert exc.value.headers["Retry-After"] == "1"
      assert "overloaded" in json.loads(exc.value.read())["error"]
    finally:
      with service._inflight_lock:
        service._inflight -= service.max_queue
    stats = service.snapshot_stats()
    assert stats["rejected"] == rejected_before + 1
    # shedding is load-dependent, not sticky: the next request succeeds
    with _post(base_url + "/synthesize?seed=61&format=npy",
               _mel_bytes(10)) as r:
      assert r.status == 200

  def test_concurrent_admission_releases(self, service):
    """_admit/_release bracket every path: after a burst completes the
    in-flight count returns to zero."""
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
      futs = [pool.submit(service.synthesize_mel_packed,
                          rand_mels(1, 10, seed=s)[0], seed=s)
              for s in range(6)]
      for f in futs:
        assert f.result().samples.shape == (10 * 256,)
    assert service._inflight == 0

  def test_client_retries_503_with_backoff(self, base_url, service):
    """SynthesisClient backs off on 503 and succeeds once the daemon has
    capacity again (saturation cleared by a timer mid-retry)."""
    from waveglow_tpu.inference.client import SynthesisClient

    client = SynthesisClient(base_url, retries_503=3)
    with service._inflight_lock:
      service._inflight += service.max_queue

    def clear():
      with service._inflight_lock:
        service._inflight -= service.max_queue

    timer = threading.Timer(0.5, clear)
    timer.start()
    try:
      wav = client.synthesize(rand_mels(1, 10, seed=63)[0], seed=63)
    finally:
      timer.join()
    assert wav.shape == (10 * 256,)

    # retries exhausted -> the 503 propagates
    with service._inflight_lock:
      service._inflight += service.max_queue
    try:
      nowait = SynthesisClient(base_url, retries_503=0)
      with pytest.raises(urllib.error.HTTPError) as exc:
        nowait.synthesize(rand_mels(1, 10, seed=64)[0], seed=64)
      assert exc.value.code == 503
    finally:
      with service._inflight_lock:
        service._inflight -= service.max_queue

  def test_overload_burst_sheds_and_recovers(self, tmp_path):
    """Stress: 12 concurrent clients against max_queue=2 — some requests
    shed with 503, every non-shed request completes correctly, counters
    reconcile, and the daemon ends idle (in_flight == 0)."""
    import concurrent.futures

    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_queue=2)
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
      svc.synthesize_mel_packed(rand_mels(1, 10, seed=0)[0])  # compile

      def one(seed):
        try:
          with _post(url + f"/synthesize?seed={seed}&format=npy",
                     _mel_bytes(10, seed=seed)) as r:
            wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
            return ("ok", wav.shape)
        except urllib.error.HTTPError as e:
          code = e.code
          e.close()
          return ("shed", code)

      with concurrent.futures.ThreadPoolExecutor(12) as pool:
        results = list(pool.map(one, range(12)))
      ok = [r for r in results if r[0] == "ok"]
      shed = [r for r in results if r[0] == "shed"]
      assert all(shape == (10 * 256,) for _, shape in ok)
      assert all(code == 503 for _, code in shed)
      assert len(shed) >= 1, "12-vs-2 burst must shed something"
      stats = svc.snapshot_stats()
      # every request is accounted exactly once (the warm-up call is +1)
      assert stats["requests"] == len(ok) + 1
      assert stats["rejected"] == len(shed)
      assert stats["in_flight"] == 0
    finally:
      httpd.shutdown()
      httpd.server_close()

  def test_stats_latency_percentiles(self, base_url, service):
    with _post(base_url + "/synthesize?seed=62&format=npy",
               _mel_bytes(10)) as r:
      r.read()
    stats = service.snapshot_stats()
    lat = stats["latency_s"]
    assert lat["count"] >= 1
    assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"]
    assert stats["in_flight"] == 0
    assert stats["max_queue"] == service.max_queue


class TestWarmupAndDrain:

  def test_warmup_precompiles_every_burst_program(self):
    """After warmup, a first traffic burst adds ZERO compiled programs —
    no ~37 s XLA compile can land inside the device lock."""
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=4)
    report = svc.warmup([10])
    assert report["programs"] == 6  # (solo + b2 + b4) x (denoised + raw)
    synth = svc.synth
    caches = (synth._infer_packed._cache_size(),
              synth._infer_packed_raw._cache_size(),
              synth._infer_packed_many._cache_size(),
              synth._infer_packed_many_raw._cache_size())
    for strength in (0.0005, 0.0):
      for b in (1, 2, 3, 4):  # 3 decomposes to 2+1: still warm
        mels = [rand_mels(1, 10, seed=s)[0] for s in range(b)]
        out = synth.infer_serving_many(mels, seeds=list(range(b)),
                                       bucket_frames=BUCKET,
                                       denoiser_strength=strength,
                                       max_batch=4)
        assert len(out) == b
    assert (synth._infer_packed._cache_size(),
            synth._infer_packed_raw._cache_size(),
            synth._infer_packed_many._cache_size(),
            synth._infer_packed_many_raw._cache_size()) == caches

  def test_begin_drain_sheds_new_work_and_counts(self):
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=1)
    mel = rand_mels(1, 10, seed=0)[0]
    svc.synthesize_mel_packed(mel)  # healthy before
    svc.begin_drain()
    from waveglow_tpu.inference.server import ServerOverloadedError
    with pytest.raises(ServerOverloadedError, match="draining"):
      svc.synthesize_mel_packed(mel)
    assert svc.in_flight() == 0
    assert svc.snapshot_stats()["rejected"] == 1


class TestReloadAndMetrics:

  def test_reload_hot_swaps_weights(self, base_url, service, tmp_path):
    """POST /reload swaps the daemon's weights in place: same request,
    different audio after, /healthz iteration updated, zero recompiles
    (covered at the library level by TestHotReload)."""
    from waveglow_tpu.inference.client import SynthesisClient

    client = SynthesisClient(base_url)
    mel = rand_mels(1, 10, seed=70)[0]
    before = client.synthesize(mel, seed=70)
    assert client.health()["model"]["iteration"] == 100
    ck2 = tiny_checkpoint(seed=9, perturb_end=True)
    ck2.iteration = 580123  # distinct, so the update is observable
    path2 = tmp_path / "ck2.npz"
    ck2.save(path2)
    try:
      out = client.reload(path2)
      assert out["status"] == "reloaded"
      assert out["iteration"] == 580123
      after = client.synthesize(mel, seed=70)
      assert np.abs(before - after).max() > 1e-4
      assert client.health()["model"]["iteration"] == 580123
      assert client.stats()["reloads"] >= 1
    finally:
      # the service fixture is module-scoped: restore the original weights
      # (tiny_checkpoint is deterministic) for the tests that follow
      orig = tmp_path / "orig.npz"
      tiny_checkpoint(seed=1, perturb_end=True).save(orig)
      client.reload(orig)
    restored = client.synthesize(mel, seed=70)
    np.testing.assert_allclose(restored, before, atol=1e-6)

  def test_reload_applies_serve_time_custom_hparams(self, tmp_path):
    """A daemon started with config-affecting --custom-hparams must apply
    the SAME overrides when judging a reload candidate's architecture —
    dropping them made every hot-swap a spurious 'architecture mismatch'
    (checkpoint hparams say 12 flows, overridden serving config says 2)."""
    from dataclasses import asdict

    from waveglow_tpu.hparams import HParams, parse_custom_hparams

    ck = tiny_checkpoint(seed=2, perturb_end=True)
    # checkpoint whose EMBEDDED hparams are the full defaults; the tiny
    # architecture comes entirely from serve-time overrides
    mismarked = CheckpointWaveglow(
        state_dict=ck.state_dict, optimizer=None,
        learning_rate=ck.learning_rate, iteration=7,
        hparams=asdict(HParams()))
    svc = SynthesisService(mismarked,
                           custom_hparams=parse_custom_hparams(TINY),
                           bucket_frames=BUCKET, max_batch=1)
    path = tmp_path / "mismarked.npz"
    mismarked.save(path)
    out = svc.reload(str(path))
    assert out["iteration"] == 7
    res = svc.synthesize_mel_packed(rand_mels(1, 10, seed=72)[0], seed=72)
    assert res.samples.shape == (10 * 256,)

  def test_reload_under_concurrent_load(self, tmp_path):
    """Hot-swap racing a synthesize storm: every request succeeds and
    returns one of the two models' outputs (old before the swap, new
    after) — no crashes, no torn programs, daemon idle afterwards."""
    import concurrent.futures

    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET)
    mel = rand_mels(1, 10, seed=80)[0]
    # raw path (strength=0): the model params are ONE atomic attribute
    # read, so every request is exactly old-model or new-model output (a
    # denoised request racing the swap may legitimately pair new params
    # with the old bias for one request — benign, but not old-or-new)
    kw = dict(seed=80, denoiser_strength=0.0)
    old = svc.synthesize_mel_packed(mel, **kw).samples
    ck2 = tiny_checkpoint(seed=9, perturb_end=True)
    path2 = tmp_path / "race_ck2.npz"
    ck2.save(path2)

    def worker(i):
      return svc.synthesize_mel_packed(mel, **kw).samples

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
      futs = [pool.submit(worker, i) for i in range(8)]
      svc.reload(str(path2))
      futs += [pool.submit(worker, i) for i in range(8)]
      outs = [f.result() for f in futs]

    new = svc.synthesize_mel_packed(mel, **kw).samples
    assert np.abs(old - new).max() > 1e-4  # the swap changed the model
    for out in outs:
      matches_old = np.allclose(out, old, atol=1e-5)
      matches_new = np.allclose(out, new, atol=1e-5)
      assert matches_old or matches_new
    assert svc.in_flight() == 0

  def test_reload_bad_body_is_400(self, base_url):
    with pytest.raises(urllib.error.HTTPError) as exc:
      _post(base_url + "/reload", b'{"nope": 1}')
    assert exc.value.code == 400

  def test_reload_missing_file_is_400(self, base_url):
    with pytest.raises(urllib.error.HTTPError) as exc:
      _post(base_url + "/reload", b'{"checkpoint": "/no/such/ckpt.npz"}')
    assert exc.value.code == 400

  def test_metrics_prometheus_format(self, base_url, service):
    from waveglow_tpu.inference.client import SynthesisClient

    client = SynthesisClient(base_url)
    client.synthesize(rand_mels(1, 10, seed=71)[0], seed=71)
    text = client.metrics()
    assert "# TYPE waveglow_requests_total counter" in text
    assert "# TYPE waveglow_request_latency_seconds summary" in text
    lines = dict(
        line.rsplit(" ", 1) for line in text.splitlines()
        if line and not line.startswith("#") and "{" not in line)
    assert float(lines["waveglow_requests_total"]) >= 1
    assert float(lines["waveglow_audio_seconds_total"]) > 0
    assert float(lines["waveglow_in_flight"]) == 0
    # per-stage gauges: the HTTP request above recorded transport stages
    assert "# TYPE waveglow_request_stage_seconds gauge" in text
    assert 'waveglow_request_stage_seconds{stage="service",quantile="0.5"}' \
        in text


class TestStreamInterleaving:

  def test_synthesize_completes_while_stream_open(self, service):
    """The device lock is held per stream WINDOW, not per utterance: with a
    stream generator open (first piece already pulled, more remaining), a
    synthesize call from another thread must complete instead of queueing
    behind the stream's full duration (it would deadlock/timeout here,
    since this test never advances the stream while waiting)."""
    import threading

    mel = rand_mels(1, 24, seed=50)[0]
    pieces = service.stream_mel(mel, seed=50, chunk_frames=4)
    first = next(pieces)  # stream is mid-utterance, generator open
    assert len(first) > 0
    result = {}

    def synth():
      result["out"] = service.synthesize_mel_packed(
          rand_mels(1, 10, seed=51)[0], seed=51)

    t = threading.Thread(target=synth, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "synthesize blocked behind an open stream"
    assert result["out"].samples.shape == (10 * 256,)
    rest = list(pieces)  # the stream still finishes intact
    total = len(first) + sum(len(p) for p in rest)
    assert total == 24 * 256


class TestStreamDisconnect:

  def test_disconnect_mid_stream_releases_device(self, base_url, service):
    """A client hanging up mid-stream must not wedge the daemon: the write
    loop catches the broken pipe, closes the generator (releasing the
    device lock it holds), and later requests succeed."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(base_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    conn.request("POST", "/stream?seed=40&chunk_frames=4",
                 body=_mel_bytes(24, seed=40))
    resp = conn.getresponse()
    resp.read(512)  # start consuming the first chunk...
    conn.close()    # ...then hang up mid-utterance

    # the daemon recovers: a follow-up request completes normally
    with _post(base_url + "/synthesize?seed=41&format=npy",
               _mel_bytes(10, seed=41)) as r:
      wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
    assert wav.shape == (10 * 256,)


class TestSizeAdmission:
  """max_frames: the size axis of admission control. max_queue bounds how
  MANY requests are in flight; max_frames bounds how BIG one is — without
  it, MAX_BODY_BYTES admits a single ~840k-frame mel, one fused program
  over hours of audio (an HBM OOM or a multi-minute device-lock stall)."""

  def test_oversize_mel_is_413_and_daemon_stays_healthy(self):
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_frames=32)
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
      with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/synthesize", _mel_bytes(40))
      assert e.value.code == 413
      assert "max_frames=32" in json.loads(e.value.read())["error"]
      # daemon unharmed: a legal request still serves, counters reconcile
      with _post(url + "/synthesize?format=npy", _mel_bytes(10)) as r:
        wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
      assert wav.shape == (10 * 256,)
      stats = svc.snapshot_stats()
      assert stats["rejected"] == 1    # the 413, counted as shed load
      assert stats["errors"] == 0      # ... not as a client error
      assert stats["requests"] == 1
      with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["serving"]["max_frames"] == 32
    finally:
      httpd.shutdown()
      httpd.server_close()

  def test_stream_limited_and_zero_disables(self):
    from waveglow_tpu.inference.server import RequestTooLargeError

    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_frames=16)
    with pytest.raises(RequestTooLargeError):
      next(svc.stream_mel(np.zeros((80, 20), np.float32)))
    assert svc.in_flight() == 0  # rejected before admission
    svc.max_frames = 0
    checked = svc._check_mel(np.zeros((80, 9000), np.float32))
    assert checked.shape == (80, 9000)


class TestKeepAliveSafety:
  """An error response sent BEFORE the request body was read must close the
  connection: this handler is HTTP/1.1 keep-alive, and a reused socket
  would otherwise parse the next request starting at the leftover body
  bytes (protocol desync -> garbage 400s). The bundled client sends
  Connection: close, so these tests speak raw http.client keep-alive."""

  @staticmethod
  def _conn(base_url, timeout=120):
    import http.client
    host, port = base_url.replace("http://", "").split(":")
    return http.client.HTTPConnection(host, int(port), timeout=timeout)

  def test_early_400_closes_connection(self, base_url):
    conn = self._conn(base_url)
    try:
      body = _mel_bytes(10)
      # format=mp3 fails validation BEFORE _read_body(): body never read
      conn.request("POST", "/synthesize?format=mp3", body=body)
      r1 = conn.getresponse()
      assert r1.status == 400
      assert r1.headers.get("Connection", "").lower() == "close"
      r1.read()
      conn.close()  # server closed its side; reconnect and verify service
      conn = self._conn(base_url)
      conn.request("POST", "/synthesize?format=npy", body=body)
      r2 = conn.getresponse()
      assert r2.status == 200
      r2.read()
    finally:
      conn.close()

  def test_late_error_keeps_connection_usable(self, base_url):
    """An error raised AFTER the body was consumed keeps the keep-alive
    contract: two bad-mel requests pipeline safely over ONE socket."""
    conn = self._conn(base_url)
    try:
      buf = io.BytesIO()
      np.save(buf, np.zeros((3, 10), np.float32), allow_pickle=False)
      bad = buf.getvalue()
      for _ in range(2):  # the second request proves no desync
        conn.request("POST", "/synthesize", body=bad)
        r = conn.getresponse()
        assert r.status == 400
        assert "expected mel" in json.loads(r.read())["error"]
        assert r.headers.get("Connection", "").lower() != "close"
    finally:
      conn.close()

  def test_early_503_closes_connection(self, base_url, service):
    with service._inflight_lock:
      service._inflight += service.max_queue
    conn = self._conn(base_url, timeout=30)
    try:
      conn.request("POST", "/synthesize", body=_mel_bytes(10))
      r = conn.getresponse()
      assert r.status == 503
      assert r.headers.get("Connection", "").lower() == "close"
      r.read()
    finally:
      conn.close()
      with service._inflight_lock:
        service._inflight -= service.max_queue


class TestReloadSafety:
  """POST /reload reaches torch.load (arbitrary pickle deserialization) for
  torch-format checkpoints; that path must be opt-in."""

  def test_torch_reload_rejected_by_default(self, base_url, tmp_path):
    import torch
    path = tmp_path / "anything.pt"
    torch.save({"not": "a checkpoint"}, str(path))
    body = json.dumps({"checkpoint": str(path)}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
      _post(base_url + "/reload", body)
    assert e.value.code == 400
    assert "refusing" in json.loads(e.value.read())["error"]

  def test_torch_reload_allowed_with_opt_in(self, tmp_path):
    """--allow-torch-reload hot-swaps a reference-format .pt; this also
    regression-covers content sniffing routing a torch ZIP (PK magic,
    same as npz) to the torch importer."""
    from waveglow_tpu.checkpointing.export_torch import \
        export_torch_checkpoint

    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, allow_torch_reload=True)
    ck2 = tiny_checkpoint(seed=9, perturb_end=True)
    ck2.iteration = 777
    path = tmp_path / "new.pt"
    export_torch_checkpoint(ck2, path)
    out = svc.reload(str(path))
    assert out["iteration"] == 777
    assert svc.synth.iteration == 777


class TestStreamAccounting:

  def test_aborted_stream_counts_partial_audio(self):
    """A client disconnect closes the response generator (GeneratorExit);
    the consumed pieces must still land in requests/audio_seconds — under
    disconnect-heavy traffic /stats and /metrics would otherwise
    undercount arbitrarily."""
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET)
    before = svc.snapshot_stats()
    gen = svc.stream_mel(rand_mels(1, 12, seed=3)[0], chunk_frames=4)
    piece = next(gen)
    assert piece.shape[0] > 0
    gen.close()  # what the handler's pieces.close() does on disconnect
    after = svc.snapshot_stats()
    assert after["requests"] == before["requests"] + 1
    expected = piece.shape[0] / svc.sampling_rate
    # snapshot_stats rounds audio_seconds to 3 decimals
    assert after["audio_seconds"] == pytest.approx(
        before["audio_seconds"] + expected, abs=1e-3)
    assert svc.in_flight() == 0


class TestMeshServing:
  """BASELINE config 5 as a RUNNABLE service: the HTTP daemon (micro-batcher
  included) dispatching through a mesh-sharded model on the virtual 8-device
  mesh — data-parallel rows, tensor-parallel WN channels, time-sharded long
  utterances — with outputs pinned to the single-device daemon's."""

  def _spin(self, svc):
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_port}"

  def test_dp_mesh_daemon_micro_batches_match_single_device(self, service):
    """Concurrent HTTP traffic against a (4, 1) data mesh: micro-batched
    rows shard across 4 chips; every response equals the unsharded daemon's
    for the same (mel, seed)."""
    import concurrent.futures

    from waveglow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(data=4, model=1)
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=4,
                           batch_window_ms=100.0, mesh=mesh)
    httpd, url = self._spin(svc)
    try:
      with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["mesh"] == {"data": 4, "model": 1}
      svc.warmup([10])  # compile outside the burst

      def one(seed):
        with _post(url + f"/synthesize?seed={seed}&format=npy",
                   _mel_bytes(10, seed=seed)) as r:
          return seed, np.load(io.BytesIO(r.read()), allow_pickle=False)

      with concurrent.futures.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(one, range(8)))
      for seed, wav in results:
        expected = service.synth.infer_serving(
            rand_mels(1, 10, seed=seed)[0], seed=seed, bucket_frames=BUCKET)
        np.testing.assert_allclose(wav, expected.samples, atol=1e-4)
      # the burst actually exercised mesh-sharded micro-batches
      assert svc.snapshot_stats()["batched_requests"] >= 2
    finally:
      httpd.shutdown()
      httpd.server_close()

  def test_tp_mesh_daemon_shards_wn_channels(self, service):
    """A (2, 2) DP x TP mesh: the WN hidden-channel weights must PHYSICALLY
    live sharded over the model axis, requests must match the unsharded
    daemon, and /reload must preserve the sharded placement."""
    from waveglow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(data=2, model=2)
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=2, mesh=mesh)

    def assert_tp_sharded(params):
      for flow in params["flows"]:
        for layer in flow["wn"]["in_layers"]:
          w = layer["w"]
          shard = w.sharding.shard_shape(w.shape)
          assert shard[-1] == w.shape[-1] // 2, (shard, w.shape)

    assert_tp_sharded(svc.synth.params)
    httpd, url = self._spin(svc)
    try:
      with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["mesh"] == {"data": 2, "model": 2}
      with _post(url + "/synthesize?seed=4&format=npy",
                 _mel_bytes(12, seed=4)) as r:
        wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
      expected = service.synth.infer_serving(
          rand_mels(1, 12, seed=4)[0], seed=4, bucket_frames=BUCKET)
      np.testing.assert_allclose(wav, expected.samples, atol=1e-4)

      # hot reload keeps the TP placement (update_params re-commits
      # through the same mesh specs)
      import tempfile
      with tempfile.TemporaryDirectory() as d:
        path = f"{d}/reload.npz"
        ck2 = tiny_checkpoint(seed=9, perturb_end=True)
        ck2.iteration = 4242
        ck2.save(path)
        body = json.dumps({"checkpoint": path}).encode()
        with _post(url + "/reload", body) as r:
          assert json.loads(r.read())["iteration"] == 4242
      assert_tp_sharded(svc.synth.params)
      with _post(url + "/synthesize?seed=4&format=npy",
                 _mel_bytes(12, seed=4)) as r:
        wav2 = np.load(io.BytesIO(r.read()), allow_pickle=False)
      assert np.abs(wav2 - wav).max() > 1e-4  # new weights took effect
    finally:
      httpd.shutdown()
      httpd.server_close()

  def test_tp_mesh_classic_and_stream_paths(self, service):
    """The NON-packed serving paths under a TP mesh: the classic
    InferenceResult path (synthesize_mel -> _infer_keyed) and the
    streaming generator both run against sharded params and match the
    unsharded daemon."""
    from waveglow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(data=1, model=4)
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=1, mesh=mesh)
    mel = rand_mels(1, 12, seed=8)[0]

    classic = svc.synthesize_mel(mel, seed=8)
    expected = service.synthesize_mel(mel, seed=8)
    np.testing.assert_allclose(classic.wav_denoised, expected.wav_denoised,
                               atol=1e-4)

    pieces = [p for p in svc.stream_mel(mel, seed=8, chunk_frames=4,
                                        denoiser_strength=0.0)]
    got = np.concatenate(pieces)
    ref_pieces = [p for p in service.stream_mel(mel, seed=8, chunk_frames=4,
                                                denoiser_strength=0.0)]
    np.testing.assert_allclose(got, np.concatenate(ref_pieces), atol=1e-4)

  def test_time_mesh_daemon_long_utterance(self, service):
    """An 8-way time mesh: the request mel's frame axis shards across all
    chips (GSPMD conv-halo exchanges); output equals the unsharded daemon."""
    from waveglow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_time_mesh(8)
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=1, mesh=mesh)
    httpd, url = self._spin(svc)
    try:
      with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["mesh"] == {"time": 8}
      with _post(url + "/synthesize?seed=6&format=npy",
                 _mel_bytes(32, seed=6)) as r:
        wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
      expected = service.synth.infer_serving(
          rand_mels(1, 32, seed=6)[0], seed=6, bucket_frames=BUCKET)
      np.testing.assert_allclose(wav, expected.samples, atol=1e-4)
    finally:
      httpd.shutdown()
      httpd.server_close()

  def test_serve_cli_builds_mesh_from_flags(self, tmp_path):
    """The serve subcommand's mesh flags construct the right mesh (parser
    through service construction, stopping short of serve_forever)."""
    from waveglow_tpu.cli.main import build_parser

    parser = build_parser()
    ck_path = tmp_path / "tiny.npz"
    tiny_checkpoint(seed=1, perturb_end=True).save(ck_path)
    ns = parser.parse_args(["serve", str(ck_path), "--mesh-data", "4",
                            "--mesh-model", "2"])
    assert (ns.mesh_data, ns.mesh_model, ns.mesh_time) == (4, 2, 1)
    ns_bad = parser.parse_args(["serve", str(ck_path), "--mesh-time", "4",
                                "--mesh-data", "2"])
    import waveglow_tpu.cli.serve_cmd as serve_cmd
    with pytest.raises(ValueError, match="mutually exclusive"):
      serve_cmd._run(ns_bad)


class TestStageDecomposition:
  """Per-request stage timings in /stats (stages_ms): transport stages from
  the handler, service stages from the micro-batcher — the serving ceiling
  must decompose under real load, not only in offline harnesses."""

  def test_http_request_records_transport_stages(self):
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, max_batch=4)
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
      import concurrent.futures
      with _post(url + "/synthesize?seed=1", _mel_bytes(10, seed=1)) as r:
        r.read()
      stages = svc.snapshot_stats()["stages_ms"]
      for name in ("read", "parse", "service", "serialize"):
        assert stages[name]["n"] >= 1, stages
        assert stages[name]["mean"] >= 0
      # the service stage dominates transport for a device-bound request
      assert stages["service"]["mean"] > stages["read"]["mean"]

      # a concurrent burst through the micro-batcher adds the service-side
      # decomposition (queue wait / submit / device+fetch)
      def one(seed):
        with _post(url + f"/synthesize?seed={seed}",
                   _mel_bytes(10, seed=seed)) as r:
          r.read()
      with concurrent.futures.ThreadPoolExecutor(6) as pool:
        list(pool.map(one, range(6)))
      stages = svc.snapshot_stats()["stages_ms"]
      for name in ("queue_wait", "submit", "device_fetch"):
        assert stages[name]["n"] >= 6, stages
      # stage sum ~ service time: the decomposition accounts for the whole
      # service stage (loose bound; scheduling noise allowed)
      total = sum(stages[n]["mean"]
                  for n in ("queue_wait", "submit", "device_fetch"))
      assert total <= stages["service"]["mean"] * 3
    finally:
      httpd.shutdown()
      httpd.server_close()


@pytest.mark.slow
def test_serve_cli_subprocess_with_data_mesh(tmp_path):
  """The complete production entry: `python -m waveglow_tpu serve
  --mesh-data 4` as a REAL subprocess daemon on an 8-virtual-device CPU
  backend — CLI parsing, mesh construction, service startup, HTTP traffic,
  SIGTERM drain, exit 0."""
  import os
  import signal
  import socket
  import subprocess
  import sys
  import time

  ck_path = tmp_path / "tiny.npz"
  tiny_checkpoint(seed=1, perturb_end=True).save(ck_path)

  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()

  # the daemon must provision its own CPU devices: strip every axon/jax
  # knob so the TPU sitecustomize hook stays dormant, then plain env vars
  # take effect in the child
  env = {k: v for k, v in os.environ.items()
         if not k.startswith(("JAX_", "XLA_", "PALLAS_", "AXON_", "TPU_"))}
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

  from pathlib import Path
  repo = str(Path(__file__).resolve().parent.parent)
  env["PYTHONPATH"] = repo
  proc = subprocess.Popen(
      [sys.executable, "-m", "waveglow_tpu", "serve", str(ck_path),
       "--port", str(port), "--mesh-data", "4", "--bucket-frames", "16"],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
      cwd=repo)
  url = f"http://127.0.0.1:{port}"
  try:
    deadline = time.time() + 180
    health = None
    while time.time() < deadline:
      if proc.poll() is not None:
        out, _ = proc.communicate()
        raise AssertionError(f"daemon exited rc={proc.returncode}:\n{out}")
      try:
        with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
          health = json.loads(r.read())
          break
      except (urllib.error.URLError, ConnectionError):
        time.sleep(0.5)
    assert health is not None, "daemon never became healthy"
    assert health["mesh"] == {"data": 4, "model": 1}

    with _post(url + "/synthesize?seed=3&format=npy",
               _mel_bytes(10, seed=3)) as r:
      wav = np.load(io.BytesIO(r.read()), allow_pickle=False)
    assert wav.shape == (10 * 256,)

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0, f"SIGTERM exit rc={proc.returncode}:\n{out}"
  finally:
    if proc.poll() is None:
      proc.kill()


class TestMidStreamFailure:

  def test_synthesis_error_mid_stream_truncates_without_http_garbage(self):
    """Once /stream commits its 200, a later synthesis error must NOT write
    a second HTTP status/JSON into the PCM body (the client would decode it
    as garbage audio) — the response truncates, the connection closes, and
    the failure counts as an error but NOT as a served request."""
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET)

    real_stream = svc.synth.stream

    def broken_stream(*args, **kw):
      gen = real_stream(*args, **kw)
      yield next(gen)  # first chunk succeeds -> 200 committed
      gen.close()
      raise RuntimeError("injected device failure")

    svc.synth.stream = broken_stream
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
      before = svc.snapshot_stats()
      with _post(url + "/stream?seed=1&chunk_frames=4",
                 _mel_bytes(12, seed=1)) as r:
        assert r.status == 200
        body = r.read()  # truncated at the failure point
      # a partial PCM body (the windowed denoiser's first emitted piece),
      # with no trailing "HTTP/1.1 400 ..." status or JSON text
      assert 0 < len(body) < 12 * 256 * 2  # truncated, not the full stream
      assert len(body) % 2 == 0            # whole int16 samples
      assert b"HTTP/1.1" not in body and b"error" not in body
      after = svc.snapshot_stats()
      assert after["errors"] == before["errors"] + 1
      assert after["requests"] == before["requests"]  # not a served request
      assert svc.in_flight() == 0  # admission released despite the error
      # daemon still healthy for the next request
      svc.synth.stream = real_stream
      with _post(url + "/synthesize?format=npy", _mel_bytes(10)) as r2:
        assert r2.status == 200
        r2.read()
    finally:
      httpd.shutdown()
      httpd.server_close()


class TestLoadCheckpointAs:

  def test_dispatch_and_unknown_format(self, tmp_path):
    """load_checkpoint_as loads by the CALLER's sniff result (the /reload
    TOCTOU contract) and rejects unknown format names."""
    from waveglow_tpu.checkpointing import (load_checkpoint_as,
                                            sniff_checkpoint_format)

    path = tmp_path / "c.npz"
    tiny_checkpoint(seed=2).save(path)
    fmt = sniff_checkpoint_format(path)
    assert fmt == "npz"
    assert load_checkpoint_as(path, fmt).iteration == 100
    with pytest.raises(ValueError, match="unknown checkpoint format"):
      load_checkpoint_as(path, "exotic")
    # a torch-sniffed path never silently falls back to another loader:
    # np.load(allow_pickle=False) on a swapped non-npz file fails safely
    with pytest.raises(Exception):
      load_checkpoint_as(tmp_path / "missing.pt", "torch")


class TestChunkedService:

  def test_chunked_daemon_synthesize_matches_unchunked(self, service):
    """A daemon started with --chunk-frames (constant activation memory for
    unbounded request lengths) serves /synthesize through the chunked
    fallback (the micro-batcher is disabled there): outputs must equal the
    unchunked daemon's for both response formats."""
    svc = SynthesisService(tiny_checkpoint(seed=1, perturb_end=True),
                           bucket_frames=BUCKET, chunk_frames=4)
    assert svc._batcher is None  # chunked path serializes on purpose
    httpd = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
      with _post(url + "/synthesize?seed=9&format=npy",
                 _mel_bytes(12, seed=9)) as r:
        got = np.load(io.BytesIO(r.read()), allow_pickle=False)
      expected = service.synth.infer_serving(
          rand_mels(1, 12, seed=9)[0], seed=9, bucket_frames=BUCKET)
      np.testing.assert_allclose(got, expected.samples, atol=1e-4)

      with _post(url + "/synthesize?seed=9", _mel_bytes(12, seed=9)) as r:
        rate, wav = wavfile.read(io.BytesIO(r.read()))
      assert rate == svc.sampling_rate
      assert wav.dtype == np.int16 and wav.shape == (12 * 256,)
    finally:
      httpd.shutdown()
      httpd.server_close()
