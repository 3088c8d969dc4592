"""End-to-end CLI: YAML config -> train 1 epoch -> --test best-ckpt restore.

Runs ``train_mask_bev.py`` as a subprocess on the synthetic dataset (the
reference CLI contract, ``train_mask_bev.py:34-119``), pinning the whole
wiring: flat-YAML parsing, datamodule construction, Trainer.fit with
checkpoints and metric logs, and the --test path restoring the best
checkpoint from the json index.
"""
import json
import os
import pathlib
import subprocess
import sys

CFG = """\
name: cli_smoke
dataset: synthetic
x_range: [-10, 10]
y_range: [-10, 10]
z_range: [-4, 4]
voxel_size: 0.25
num_queries: 8
head_num_classes: 1
max_points_per_scan: 2048
max_num_pillars: 1024
max_num_points: 8
encoder_feat_channels: [32, 32]
backbone_embed_dim: 48
backbone_depths: [1, 1, 2, 1]
backbone_num_heads: [3, 3, 6, 6]
backbone_window_size: 5
head_feat_channels: 64
head_out_channels: 64
head_num_decoder_layers: 3
head_ffn_dim: 128
head_num_points: 256
batch_size: 2
limit_train_batches: 2
limit_val_batches: 1
compute_train_metrics: false
log_images: false
"""


def _run_cli(tmp_path, *args):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # strip any TPU plugin site
    # conftest's 8-virtual-device XLA_FLAGS would leak in and make the
    # trainer build an 8-device mesh the batch of 2 cannot shard over
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    repo = pathlib.Path(__file__).resolve().parents[1]
    return subprocess.run(
        [sys.executable, str(repo / "train_mask_bev.py"), *args],
        cwd=str(repo), env=env, capture_output=True, text=True, timeout=1500)


def test_cli_train_then_test(tmp_path):
    cfg_path = tmp_path / "cli_smoke.yml"
    cfg_path.write_text(CFG)
    wd = tmp_path / "runs"

    r = _run_cli(tmp_path, "--config", str(cfg_path), "--train",
                 "--max-epochs", "1", "--workdir", str(wd))
    assert r.returncode == 0, r.stdout + r.stderr

    run_dir = wd / "cli_smoke"
    index = json.loads(
        (run_dir / "checkpoints" / "index.json").read_text())
    assert "best_val_loss" in index
    metrics = [json.loads(line) for line in
               (run_dir / "cli_smoke.metrics.jsonl").read_text().splitlines()]
    phases = {m.get("phase") for m in metrics}
    assert "train" in phases and "val" in phases

    r2 = _run_cli(tmp_path, "--config", str(cfg_path), "--test",
                  "--workdir", str(wd))
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "restored best checkpoint" in r2.stdout
    assert "test results:" in r2.stdout
