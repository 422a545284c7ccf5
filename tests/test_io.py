"""IO layer tests: checkpoint/resume, CSV export/read-back, streaming.

Reference: src/iostreams/ (CSV files per monitored field, write/read
round-trip — test/ParameterIOStreams.jl writes tmp CSVs and reads them
back) and the checkpoint gap noted in SURVEY.md §5 (reference persists no
sampler/tuner state; we checkpoint the full pytree + PRNG keys).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt
from klara_tpu.io import (
    load_checkpoint,
    read_chain_csv,
    save_checkpoint,
    write_chain_csv,
)


def _target():
    return kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=2)


def _small_chain(n_chains=4, destination="nstate", **kwargs):
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=2)
    job = kt.MCJob(
        target,
        kt.MALA(driftstep=1.0),
        kt.MCRange(n_steps=200, burnin=50),
        n_chains=n_chains,
        destination=destination,
        **kwargs,
    )
    return job, job.run(jax.random.key(0), jnp.zeros(2))


def test_checkpoint_roundtrip_full_state(tmp_path):
    job, chain = _small_chain()
    path = str(tmp_path / "ckpt.npz")
    tree = {"state": chain.final_state, "key": jax.random.key(42)}
    save_checkpoint(path, tree)
    restored = load_checkpoint(path, like=tree)

    flat_a = jax.tree.leaves(jax.tree.map(jnp.asarray, tree["state"]))
    flat_b = jax.tree.leaves(restored["state"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key survives (wrap/unwrap)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(tree["key"])),
        np.asarray(jax.random.key_data(restored["key"])),
    )


def test_checkpoint_resume_continues_sampling(tmp_path):
    """resume(chain) keeps adaptation state: step sizes carry over."""
    job, chain = _small_chain()
    path = str(tmp_path / "state.npz")
    save_checkpoint(path, chain.final_state)
    restored = load_checkpoint(path, like=chain.final_state)
    import dataclasses

    chain2 = job.resume(jax.random.key(1), dataclasses.replace(chain, final_state=restored))
    assert chain2.value.shape == chain.value.shape
    # continued chain stays in the typical set
    assert abs(float(chain2.flat("value").mean())) < 0.3


def test_csv_write_read_roundtrip(tmp_path):
    _, chain = _small_chain()
    d = str(tmp_path / "out")
    written = write_chain_csv(chain, d)
    assert set(written) == {"value", "logtarget", "accept"}
    back = read_chain_csv(d)
    np.testing.assert_allclose(
        back["value"], np.asarray(chain.value), rtol=1e-6
    )
    np.testing.assert_allclose(
        back["logtarget"], np.asarray(chain["logtarget"]), rtol=1e-6
    )


def test_streaming_destination(tmp_path):
    """destination='csv': draws stream to files during the run; in-memory
    trace is empty (reference :iostream destination)."""
    d = str(tmp_path / "stream")
    job, chain = _small_chain(destination="csv", filepath=d)
    assert chain.samples == {}
    files = sorted(os.listdir(d))
    assert "value.csv" in files and "logtarget.csv" in files
    rows = np.loadtxt(os.path.join(d, "value.csv"), delimiter=",")
    n_post = (200 - 50 - 1) // 1 + 1
    assert rows.shape == (n_post, 4 * 2)  # chains x dim flattened per row
    # streamed logtargets match the streamed values
    lts = np.loadtxt(os.path.join(d, "logtarget.csv"), delimiter=",")
    vals = rows.reshape(n_post, 4, 2)
    np.testing.assert_allclose(
        lts, -0.5 * np.sum(vals**2, axis=-1), rtol=1e-4
    )


def test_destination_none():
    job, chain = _small_chain(destination="none")
    assert chain.samples == {} and chain.diagnostics == {}
    assert chain.final_state.position.shape == (4, 2)


def test_read_chain_typed_roundtrip(tmp_path):
    """write_chain_csv -> read_chain returns a typed Chain that feeds the
    stats layer identically to the device trace (reference read -> NState,
    BasicContParamIOStream.jl:203-262)."""
    from klara_tpu.io import read_chain, write_chain_csv

    job = kt.MCJob(
        _target(),
        kt.MH(sigma=0.5),
        kt.MCRange(n_steps=500, burnin=100),
        n_chains=4,
        monitor=("value", "logtarget"),
        diagnostics=("accept",),
    )
    chain = job.run(jax.random.key(11), jnp.zeros(2))
    d = str(tmp_path / "trip")
    write_chain_csv(chain, d)
    back = read_chain(d)
    assert set(back.samples) == {"value", "logtarget"}
    assert set(back.diagnostics) == {"accept"}
    assert isinstance(back, type(chain))
    np.testing.assert_allclose(
        np.asarray(back.value), np.asarray(chain.value), rtol=1e-6, atol=1e-7
    )
    # stats layer accepts the reconstructed chain directly
    np.testing.assert_allclose(
        np.asarray(kt.stats.mean(back)), np.asarray(kt.stats.mean(chain)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kt.stats.ess(back)), np.asarray(kt.stats.ess(chain)), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(kt.stats.acceptance(back)), float(kt.stats.acceptance(chain)), rtol=1e-6
    )


def test_streamed_csv_reads_back_as_chain(tmp_path):
    """destination='csv' output round-trips into a Chain with identical
    stats to the device trace."""
    from klara_tpu.io import read_chain

    d = str(tmp_path / "stream")
    job_csv = kt.MCJob(
        _target(),
        kt.MH(sigma=0.5),
        kt.MCRange(n_steps=400, burnin=100),
        n_chains=4,
        monitor=("value",),
        diagnostics=("accept",),
        destination="csv",
        filepath=d,
    )
    chain = job_csv.run(jax.random.key(12), jnp.zeros(2))
    back = read_chain(d)
    assert back.samples["value"].shape == (300, 4, 2)
    assert "accept" in back.diagnostics
    ess_stream = np.asarray(kt.stats.ess(back))
    assert np.isfinite(ess_stream).all() and (ess_stream > 0).all()


def test_chain_reader_mark_reset(tmp_path):
    """mark/reset stream control (reference BasicContParamIOStream.jl:125-141)."""
    from klara_tpu.io import ChainReader, write_chain_csv

    job = kt.MCJob(
        _target(), kt.MH(sigma=0.5), kt.MCRange(n_steps=300, burnin=100), n_chains=2
    )
    chain = job.run(jax.random.key(13), jnp.zeros(2))
    d = str(tmp_path / "reader")
    write_chain_csv(chain, d)

    with ChainReader(d, fields=["value"]) as r:
        first = r.read_new()["value"]
        assert first.shape[0] == 200
        # nothing new since
        assert r.read_new()["value"].shape[0] == 0
        # reset rewinds to the (default: start) mark
        r.reset()
        again = r.read_new()["value"]
        np.testing.assert_array_equal(first, again)
        # mark partway: read after reset returns only the tail
        r.reset()
        r.mark()
        _ = r.read_new()
        r.reset()
        assert r.read_new()["value"].shape[0] == 200


def test_chain_reader_partial_trailing_line(tmp_path):
    """A concurrently-appending writer may leave a partially-flushed row;
    read_new must consume complete lines only and pick up the remainder
    once the line completes."""
    from klara_tpu.io import ChainReader

    d = tmp_path / "partial"
    d.mkdir()
    f = d / "value.csv"
    f.write_text("1.0,2.0\n3.0,4.0\n5.0,6")  # trailing row incomplete

    with ChainReader(str(d), fields=["value"]) as r:
        first = r.read_new()["value"]
        np.testing.assert_array_equal(first, [[1.0, 2.0], [3.0, 4.0]])
        # nothing new, but the width is already known -> (0, 2)
        assert r.read_new()["value"].shape == (0, 2)
        with open(f, "a") as h:
            h.write(".0\n7.0,8.0\n")
        np.testing.assert_array_equal(
            r.read_new()["value"], [[5.0, 6.0], [7.0, 8.0]]
        )


def test_read_chain_csv_stale_shape_sidecar(tmp_path):
    """A run that died mid-stream leaves an eager sidecar whose draw count
    is stale; the data decides the draws axis, the sidecar the event
    shape."""
    d = tmp_path / "stale"
    d.mkdir()
    rows = np.arange(10.0).reshape(5, 2)  # 5 draws, 1 chain x dim 2
    np.savetxt(d / "value.csv", rows, delimiter=",", fmt="%.9g")
    (d / "value.shape").write_text("3,1,2")  # stale: says 3 draws

    out = read_chain_csv(str(d))
    assert out["value"].shape == (5, 1, 2)
    np.testing.assert_array_equal(out["value"].reshape(5, 2), rows)


def test_streaming_writer_crash_leaves_readable_output(tmp_path):
    """StreamingWriter writes manifest + sidecars eagerly at stream start,
    so output from a crashed run (no close()) still reads back as a typed
    Chain."""
    from klara_tpu.io import read_chain
    from klara_tpu.io.stream import StreamingWriter

    d = str(tmp_path / "crashed")
    w = StreamingWriter(d, flush=True, sample_fields={"value"})
    for i in range(4):
        w.append(
            np.bool_(True),
            {"value": np.full((2, 3), float(i)), "accept": np.ones((2,))},
        )
    # simulate a crash: no w.close() — manifest written at first append
    chain = read_chain(d)
    assert chain.samples["value"].shape == (4, 2, 3)
    assert chain.diagnostics["accept"].shape == (4, 2)
    np.testing.assert_array_equal(
        chain.samples["value"][:, 0, 0], [0.0, 1.0, 2.0, 3.0]
    )
    w.close()


def test_sample_prior_event_shapes():
    """A multivariate prior's event shape is respected; a scalar prior is
    broadcast to the target dimension (reference BasicMCJob.jl:59-67)."""
    from klara_tpu.distributions import MvNormal, Normal

    t_mv = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(x * x),
        dim=3,
        prior=MvNormal(jnp.zeros(3), jnp.eye(3)),
    )
    assert t_mv.sample_prior(jax.random.key(0)).shape == (3,)

    t_sc = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(x * x),
        dim=4,
        prior=Normal(0.0, 1.0),
    )
    assert t_sc.sample_prior(jax.random.key(0)).shape == (4,)


def test_chunked_streaming_matches_device_trace(tmp_path):
    """csv streaming flushes once per stream_chunk steps; with a chunk size
    that doesn't divide n_steps (padding steps) the streamed rows and the
    final state must match the nstate path bit-for-bit."""
    from klara_tpu.io import read_chain

    kwargs = dict(
        target=_target(),
        sampler=kt.MH(sigma=0.5),
        mcrange=kt.MCRange(n_steps=333, burnin=100, thinning=2),
        n_chains=4,
        monitor=("value",),
        diagnostics=("accept",),
    )
    ref = kt.MCJob(**kwargs)
    chain_ref = ref.run(jax.random.key(5), jnp.zeros(2))

    d = str(tmp_path / "chunked")
    job = kt.MCJob(**kwargs, destination="csv", filepath=d, stream_chunk=50)
    chain = job.run(jax.random.key(5), jnp.zeros(2))
    back = read_chain(d)

    assert back.samples["value"].shape == chain_ref.samples["value"].shape
    np.testing.assert_allclose(
        back.samples["value"], np.asarray(chain_ref.samples["value"]), rtol=2e-7
    )
    np.testing.assert_array_equal(
        back.diagnostics["accept"], np.asarray(chain_ref.diagnostics["accept"])
    )
    # padding steps did not advance the final state
    np.testing.assert_array_equal(
        np.asarray(chain.final_state.position),
        np.asarray(chain_ref.final_state.position),
    )


def test_csv_post_mode_buffered_export(tmp_path):
    """stream_mode='post' buffers draws on device and exports the CSV
    directory after the run (no in-loop host callbacks — for backends
    without io_callback support); resume() appends a second segment."""
    from klara_tpu.io import read_chain

    d = str(tmp_path / "post")
    job = kt.MCJob(
        _target(),
        kt.MH(sigma=0.5),
        kt.MCRange(n_steps=300, burnin=100),
        n_chains=4,
        monitor=("value",),
        diagnostics=("accept",),
        destination="csv",
        filepath=d,
        stream_mode="post",
    )
    chain = job.run(jax.random.key(9), jnp.zeros(2))
    # post mode also returns the in-memory trace
    assert chain.samples["value"].shape == (200, 4, 2)
    back = read_chain(d)
    np.testing.assert_allclose(
        back.samples["value"], np.asarray(chain.samples["value"]), rtol=2e-7
    )

    second = job.resume(jax.random.key(10), chain)
    back2 = read_chain(d)
    assert back2.samples["value"].shape == (400, 4, 2)  # segments appended
    np.testing.assert_allclose(
        back2.samples["value"][200:], np.asarray(second.samples["value"]), rtol=2e-7
    )


def test_unknown_stream_mode_raises():
    with pytest.raises(ValueError, match="stream_mode"):
        kt.MCJob(
            _target(),
            kt.MH(),
            kt.MCRange(n_steps=10),
            destination="csv",
            filepath="/tmp/x",
            stream_mode="bogus",
        )
