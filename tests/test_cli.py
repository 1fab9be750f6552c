"""CLI end-to-end tests: drive train.py and test.py as subprocesses on the
synthetic fixture (CPU via MAP_PLATFORM; compile cache shared so reruns are
fast)."""

import glob
import os
import subprocess
import sys

import pytest
import yaml

pytestmark = pytest.mark.slow  # e2e: full train/eval cycles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["MAP_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from multiagentperception_tpu.data.synthetic import generate_fixture

    wd = tmp_path_factory.mktemp("cli")
    generate_fixture(str(wd / "data"), target_view="6agent", img_size=128,
                     frames_per_traj=2)
    cfg = {
        "model": {"arch": "MIMOcom", "agent_num": 6,
                  "shared_img_encoder": "unified", "attention": "general",
                  "sparse": False, "query": True, "query_size": 8,
                  "key_size": 64, "enc_backbone": "resnet_encoder",
                  "dec_backbone": "simple_decoder", "feat_squeezer": -1,
                  "feat_channel": 512, "multiple_output": True},
        "data": {"dataset": "airsim", "train_split": "train",
                 "val_split": "val", "test_split": "test", "img_rows": 128,
                 "img_cols": 128, "path": str(wd / "data"),
                 "target_view": "6agent", "commun_label": "mimo"},
        "training": {"train_iters": 2, "batch_size": 2, "val_interval": 2,
                     "n_workers": 2, "print_interval": 1,
                     "optimizer": {"name": "adam", "lr": 1.0e-4},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    }
    with open(wd / "smoke.yml", "w") as f:
        yaml.safe_dump(cfg, f)
    return wd


class TestTrainCLI:
    def test_train_then_test_roundtrip(self, workdir):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--config", "smoke.yml"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "Validation when2com accuracy" in r.stdout
        assert "Overall" in r.stdout
        ckpts = glob.glob(str(workdir / "runs" / "smoke" / "*" /
                              "MIMOcom_airsim_best_model.ckpt"))
        assert ckpts, r.stdout[-2000:]

        r2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "test.py"),
             "--config", "smoke.yml", "--model_path", ckpts[0],
             "--inference_mode", "softmax"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=900,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
        assert "Bandwidth: 5.0" in r2.stdout  # N-1 for softmax mode
        assert "Overall" in r2.stdout

        # sharded eval: same checkpoint over a 2-device virtual mesh
        env_dp = _env()
        env_dp["XLA_FLAGS"] = (env_dp.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
        r3 = subprocess.run(
            [sys.executable, os.path.join(REPO, "test.py"),
             "--config", "smoke.yml", "--model_path", ckpts[0],
             "--inference_mode", "softmax", "--data_parallel", "2"],
            cwd=workdir, env=env_dp, capture_output=True, text=True,
            timeout=900,
        )
        assert r3.returncode == 0, r3.stderr[-3000:]
        assert "Bandwidth: 5.0" in r3.stdout
        # same checkpoint, same data: the sharded run's score tables match
        # the single-device run's (placement is not a program change)
        tail = lambda out: out[out.index("Overall"):]
        assert tail(r3.stdout) == tail(r2.stdout)

    def test_reference_config_schema_accepted(self, workdir):
        # load one of the repo's shipped (reference-schema) configs and point
        # it at the fixture: the CLI must accept the schema unchanged
        src = os.path.join(REPO, "configs", "multi-request-multi-support",
                           "mrms_when2com.yml")
        with open(src) as f:
            cfg = yaml.safe_load(f)
        cfg["data"]["path"] = str(workdir / "data")
        cfg["data"]["img_rows"] = cfg["data"]["img_cols"] = 128
        cfg["model"]["query_size"], cfg["model"]["key_size"] = 8, 64
        cfg["training"].update(train_iters=1, val_interval=1, batch_size=2,
                               n_workers=2, print_interval=1)
        with open(workdir / "ref_schema.yml", "w") as f:
            yaml.safe_dump(cfg, f)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--config", "ref_schema.yml"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]

    def test_run_time_multi_run_aggregates(self, workdir):
        """--run_time N repeats with distinct seeds and prints the mean±std
        aggregate the reference's dead score_list code intended
        (reference train.py:76-105, 107)."""
        cfg = yaml.safe_load(open(workdir / "smoke.yml"))
        cfg["model"] = {"arch": "Single_agent", "agent_num": 6,
                        "enc_backbone": "resnet_encoder",
                        "dec_backbone": "simple_decoder",
                        "feat_squeezer": -1, "feat_channel": 512,
                        "multiple_output": True}
        cfg["data"]["commun_label"] = "None"
        with open(workdir / "multi.yml", "w") as f:
            yaml.safe_dump(cfg, f)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--config", "multi.yml", "--run_time", "2"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "Aggregate over 2 runs" in r.stdout
        assert "Mean IoU" in r.stdout
        assert r.stdout.count("RUNDIR") == 2
        runs = glob.glob(str(workdir / "runs" / "multi" / "*"))
        assert len(runs) == 2

    def test_missing_model_path_errors(self, workdir):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "test.py"),
             "--config", "smoke.yml"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=120,
        )
        assert r.returncode != 0
        assert "--model_path" in r.stderr


class TestReexecHandshake:
    def test_reexec_env_rejoins_run_and_resumes(self, workdir):
        """train.py's side of the rss_limit_gb restart (utils.reexec_self):
        a process started with MAP_REEXEC_RESUME/LOGDIR/RUN_IDX — exactly the
        environment the exec'd image inherits — must reuse the original run
        directory and continue from the checkpointed iter instead of
        starting a fresh timestamped run at iter 0."""
        cfg = yaml.safe_load(open(workdir / "smoke.yml"))
        cfg["model"] = {"arch": "Single_agent", "agent_num": 6,
                        "enc_backbone": "resnet_encoder",
                        "dec_backbone": "simple_decoder",
                        "feat_squeezer": -1, "feat_channel": 512,
                        "multiple_output": True}
        cfg["data"]["commun_label"] = "None"
        cfg["training"]["save_interval"] = 1
        with open(workdir / "rss.yml", "w") as f:
            yaml.safe_dump(cfg, f)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--config", "rss.yml"],
            cwd=workdir, env=_env(), capture_output=True, text=True,
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        logdir = r.stdout.split("RUNDIR: ")[1].splitlines()[0].strip()
        latest = os.path.join(str(workdir), logdir,
                              "Single_agent_airsim_latest.ckpt")
        assert os.path.exists(latest)

        # "after the exec": same argv, handshake env set, a larger budget
        cfg["training"]["train_iters"] = 4
        with open(workdir / "rss.yml", "w") as f:
            yaml.safe_dump(cfg, f)
        env = _env()
        env["MAP_REEXEC_RESUME"] = latest
        env["MAP_REEXEC_LOGDIR"] = logdir
        env["MAP_REEXEC_RUN_IDX"] = "0"
        r2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--config", "rss.yml"],
            cwd=workdir, env=env, capture_output=True, text=True,
            timeout=900,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
        assert f"RUNDIR: {logdir}" in r2.stdout  # rejoined, no new dir
        assert "Loaded checkpoint" in r2.stdout + r2.stderr
        assert "Iter [4/4]" in r2.stdout  # continued 3..4, not 1..4
        assert "Iter [1/4]" not in r2.stdout
