"""CLI plumbing tests (in-process main(), tiny configs, CPU)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("clidata")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = np.zeros((48, 48, 3), np.uint8)
        arr[..., i % 3] = 170
        arr += rng.randint(0, 50, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return root


def test_histogan_cli_train_and_generate(data_dir, tmp_path, monkeypatch):
    from histogan_tpu.cli import histogan as cli

    monkeypatch.chdir(tmp_path)
    args = [
        "--data", str(data_dir), "--name", "t", "--results_dir", "res",
        "--models_dir", "mod", "--image_size", "32", "--network_capacity", "4",
        "--batch_size", "2", "--gradient_accumulate_every", "1",
        "--num_train_steps", "1", "--save_every", "1", "--new", "True",
        "--hist_bin", "16", "--num_devices", "1",
    ]
    cli.main(args)
    assert Path("mod/t/model_0").exists()
    assert json.loads(Path("mod/t/.config.json").read_text())["image_size"] == 32

    cli.main([
        "--generate", "True", "--name", "t", "--results_dir", "res",
        "--models_dir", "mod", "--target_hist", str(data_dir / "1.jpg"),
        "--num_image_tiles", "2", "--hist_bin", "16", "--num_devices", "1",
    ])
    outs = list(Path("res/t").glob("generated-1-*.jpg"))
    assert outs, "generate mode must write a sample grid"


def test_create_hist_tools(data_dir, tmp_path, monkeypatch):
    from histogan_tpu.cli import create_hist_data, create_hist_sample

    monkeypatch.chdir(tmp_path)
    create_hist_data.main([
        "--input_dir", str(data_dir), "--output", "pool.npy",
        "--hist_bin", "16", "--hist_insz", "40",
    ])
    pool = np.load("pool.npy")
    assert pool.shape == (6, 1, 3, 16, 16)
    np.testing.assert_allclose(pool.sum(axis=(1, 2, 3, 4)), 1.0, atol=1e-3)

    create_hist_sample.main([
        "--image", str(data_dir / "0.jpg"), "--output_dir", "hists",
        "--hist_bin", "16",
    ])
    h = np.load("hists/0.npy")
    assert h.shape == (1, 3, 16, 16)


def test_rehistogan_cli_sampling_generate(data_dir, tmp_path, monkeypatch):
    from histogan_tpu.cli import rehistogan as cli

    monkeypatch.chdir(tmp_path)
    # build a pool for sampling mode
    from histogan_tpu.cli import create_hist_data

    Path("histogram_data").mkdir()
    create_hist_data.main([
        "--input_dir", str(data_dir),
        "--output", "histogram_data/histograms.npy", "--hist_bin", "16",
    ])
    # train one step to create a checkpoint, then recolor via sampling
    cli.main([
        "--data", str(data_dir), "--name", "r", "--results_dir", "res",
        "--models_dir", "mod", "--image_size", "32", "--network_capacity", "4",
        "--batch_size", "2", "--gradient_accumulate_every", "1",
        "--num_train_steps", "1", "--save_every", "1", "--new", "True",
        "--hist_bin", "16", "--variance_loss", "False",
    ])
    cli.main([
        "--generate", "True", "--name", "r", "--results_dir", "res",
        "--models_dir", "mod", "--input_image", str(data_dir / "2.jpg"),
        "--sampling", "True", "--target_number", "2", "--hist_bin", "16",
        "--image_size", "32", "--network_capacity", "4",
    ])
    outs = list(Path("res/r").glob("*-output-*.jpg"))
    assert len(outs) == 2
