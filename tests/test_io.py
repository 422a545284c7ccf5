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
