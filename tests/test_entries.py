"""The reference-compatible CLI entry points, run as real subprocesses on
the synthetic dataset (no data needed): ``python train.py`` end-to-end with
results files, and the standalone ``python test.py`` (which works here,
unlike the reference's broken ``__main__`` — SURVEY.md §7.5)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_train_entry_end_to_end(tmp_path):
    save = tmp_path / "run"
    p = _run([
        os.path.join(REPO, "train.py"),
        "--dataset", "synthetic", "--epochs_num", "1",
        "--queries_per_epoch", "8", "--cache_refresh_rate", "8",
        "--train_batch_size", "4", "--infer_batch_size", "4",
        "--negs_num_per_query", "2", "--neg_samples_num", "8",
        "--save_dir", str(save), "--num_workers", "2",
        "--pretrained", "false",
    ], cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    # results-file system (tools/options.py:385-419 parity)
    results_dir = save / "results"
    files = list(results_dir.glob("*.txt"))
    assert files, p.stderr[-2000:]
    body = files[0].read_text()
    assert "epoch 0" in body and "R@1" in body
    assert "Best:" in (save / "results.txt").read_text()
    # metrics jsonl written
    assert (save / "metrics.jsonl").exists()


@pytest.mark.slow
def test_test_entry_standalone(tmp_path):
    p = _run([
        os.path.join(REPO, "test.py"),
        "--dataset", "synthetic",
        "--train_batch_size", "2", "--infer_batch_size", "4",
        "--negs_num_per_query", "2",
        "--save_dir", str(tmp_path / "eval"),
        "--pretrained", "false",
        "--pca_dim", "16",  # VERDICT r2 item 5: PCA usable from the CLI
    ], cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    assert "R@1" in p.stdout, p.stdout[-500:]


@pytest.mark.slow
def test_serve_entry_build_then_search(tmp_path):
    """serve.py chained end-to-end as subprocesses: train a tiny synthetic
    checkpoint, build + persist the gallery, then answer descriptor
    queries model-free from the saved .npz (one JSON line per query with
    UTM positions)."""
    import json

    save = tmp_path / "run"
    common = ["--dataset", "synthetic", "--train_batch_size", "4",
              "--infer_batch_size", "4", "--negs_num_per_query", "2",
              "--save_dir", str(save), "--pretrained", "false"]
    p = _run([os.path.join(REPO, "train.py"), *common,
              "--epochs_num", "1", "--queries_per_epoch", "8",
              "--cache_refresh_rate", "8", "--neg_samples_num", "8",
              "--num_workers", "2"], cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]

    gal = tmp_path / "gallery.npz"
    p = _run([os.path.join(REPO, "serve.py"), "build",
              "--gallery_out", str(gal), *common,
              "--resume", "best_model"], cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    built = json.loads(p.stdout.strip().splitlines()[-1])
    assert built["rows"] > 0 and built["positions"] is True

    q = np.random.default_rng(0).standard_normal((3, 256)).astype(np.float32)
    qp = tmp_path / "q.npy"
    np.save(qp, q)
    p = _run([os.path.join(REPO, "serve.py"), "search",
              "--gallery", str(gal), "--queries", str(qp), "--k", "2"],
             cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    rows = [json.loads(l) for l in p.stdout.strip().splitlines()]
    assert len(rows) == 3
    for r in rows:
        assert len(r["indices"]) == 2 and len(r["east_north"]) == 2
        assert r["sq_distances"][0] <= r["sq_distances"][1]


@pytest.mark.slow
def test_serve_entry_http_node_search(tmp_path):
    """serve.py http x2 (model-free searcher nodes over saved gallery
    shards) + serve.py search --gallery http://a,http://b: the CLI
    scatter-gather returns the flat-gallery results."""
    import json
    import socket
    import subprocess
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    from agplace_tpu.serving import PlaceIndex

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((40, 64)).astype(np.float32)
    pos = rng.uniform(0, 100, (40, 2))
    for name, sl in [("g0.npz", slice(0, 15)), ("g1.npz", slice(15, 40))]:
        part = PlaceIndex(None, None, None)
        part.add_descriptors(feats[sl], positions=pos[sl])
        part.save_gallery(str(tmp_path / name))
    np.save(tmp_path / "q.npy", feats[[3, 20]] + 1e-3)

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    ports = [free_port(), free_port()]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    procs = []
    try:
        for port, g in zip(ports, ["g0.npz", "g1.npz"]):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(REPO, "serve.py"), "http",
                 "--gallery", str(tmp_path / g), "--port", str(port)],
                env=env, cwd=str(tmp_path), stdout=subprocess.PIPE))
        for p in procs:  # first stdout line = ready signal
            line = p.stdout.readline().decode()
            assert "serving" in line, line
        out = _run([os.path.join(REPO, "serve.py"), "search",
                    "--gallery",
                    ",".join(f"http://127.0.0.1:{p}" for p in ports),
                    "--queries", "q.npy", "--k", "3"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
        assert rows[0]["indices"][0] == 3
        assert rows[1]["indices"][0] == 20
        assert len(rows[0]["east_north"]) == 3
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()


@pytest.mark.slow
def test_bringup_smoke_loud_skip_and_random_path(tmp_path):
    """scripts/bringup_smoke.py (RUNBOOK step 2.5): without a weight
    source it must fail LOUDLY with the fetch instructions (exit 2), and
    --allow-random must run the convert->graft->embed->recall chain end
    to end from random init.  On a host WITH mounted weights the no-flag
    run succeeds instead — both legs assert accordingly."""
    import json

    script = os.path.join(REPO, "scripts", "bringup_smoke.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("AGPLACE_WEIGHTS", None)
    env["HOME"] = str(tmp_path)  # hide any ~/.cache weight mounts

    bare = subprocess.run([sys.executable, script], env=env, cwd=str(tmp_path),
                          capture_output=True, text=True, timeout=900)
    if bare.returncode == 0:
        # environment has a real weight source: the success leg
        out = json.loads(bare.stdout.strip().splitlines()[-1])
        assert out["weights"] == "pretrained"
    else:
        assert bare.returncode == 2, bare.stderr[-2000:]
        assert "fetch_weights.py" in bare.stderr
        assert "AGPLACE_WEIGHTS" in bare.stderr

    rand = subprocess.run([sys.executable, script, "--allow-random"],
                          env=env, cwd=str(tmp_path), capture_output=True,
                          text=True, timeout=900)
    assert rand.returncode == 0, rand.stderr[-2000:]
    out = json.loads(rand.stdout.strip().splitlines()[-1])
    assert len(out["recalls"]) >= 4
    assert all(0.0 <= r <= 100.0 for r in out["recalls"])
