"""Training-service tests: losses against torch goldens (torch-cpu is in the
image), metric accounting against the reference formulas, schedules."""

import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.loss import (
    bootstrapped_cross_entropy2d,
    cross_entropy2d,
    get_loss_function,
    multi_scale_cross_entropy2d,
)
from multiagentperception_tpu.metrics import averageMeter, fast_hist, runningScore
from multiagentperception_tpu.schedulers import get_scheduler
from multiagentperception_tpu.config import normalize_config


class TestCrossEntropy2d:
    def test_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
        target = rng.integers(0, 5, size=(2, 8, 8))
        ours = float(cross_entropy2d(jnp.asarray(logits), jnp.asarray(target)))
        t_logits = torch.tensor(logits).permute(0, 3, 1, 2)
        t_loss = F.cross_entropy(t_logits, torch.tensor(target), ignore_index=250)
        np.testing.assert_allclose(ours, float(t_loss), rtol=1e-5)

    def test_ignore_index(self, rng):
        logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
        target = rng.integers(0, 3, size=(1, 4, 4))
        target_ign = target.copy()
        target_ign[0, 0, :2] = 250
        import torch
        import torch.nn.functional as F

        ours = float(cross_entropy2d(jnp.asarray(logits), jnp.asarray(target_ign)))
        t = F.cross_entropy(
            torch.tensor(logits).permute(0, 3, 1, 2),
            torch.tensor(target_ign),
            ignore_index=250,
        )
        np.testing.assert_allclose(ours, float(t), rtol=1e-5)

    def test_upsample_path_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
        target = rng.integers(0, 3, size=(1, 8, 8))
        ours = float(cross_entropy2d(jnp.asarray(logits), jnp.asarray(target)))
        t_logits = torch.tensor(logits).permute(0, 3, 1, 2)
        up = F.interpolate(t_logits, size=(8, 8), mode="bilinear", align_corners=True)
        t = F.cross_entropy(up, torch.tensor(target), ignore_index=250)
        np.testing.assert_allclose(ours, float(t), rtol=1e-4)

    def test_registry(self):
        cfg = normalize_config({})
        fn = get_loss_function(cfg)
        # partial of cross_entropy2d with size_average=True
        logits = jnp.zeros((1, 2, 2, 3))
        assert float(fn(input=logits, target=jnp.zeros((1, 2, 2), jnp.int32))) > 0

    def test_multi_scale(self, rng):
        logits = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
        target = jnp.zeros((1, 4, 4), jnp.int32)
        single = cross_entropy2d(logits, target)
        multi = multi_scale_cross_entropy2d((logits, logits), target)
        np.testing.assert_allclose(float(multi), float(single) * 1.4, rtol=1e-5)

    def test_bootstrapped(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
        target = jnp.zeros((2, 4, 4), jnp.int32)
        k = 4
        loss = float(bootstrapped_cross_entropy2d(logits, target, K=k))
        full = float(cross_entropy2d(logits, target))
        assert loss >= full  # top-K of the hardest pixels


class TestRunningScore:
    def test_miou_golden(self):
        rs = runningScore(3)
        gt = np.array([[0, 0, 1, 2]])
        pred = np.array([[0, 1, 1, 2]])
        rs.update(gt, pred)
        score, cls_iu = rs.get_scores()
        # class 0: tp=1 fn=1 fp=0 -> 0.5; class 1: tp=1 fp=1 -> 0.5; class 2: 1.0
        np.testing.assert_allclose(cls_iu[0], 0.5)
        np.testing.assert_allclose(cls_iu[1], 0.5)
        np.testing.assert_allclose(cls_iu[2], 1.0)
        np.testing.assert_allclose(score["Mean IoU : \t"], (0.5 + 0.5 + 1.0) / 3)
        np.testing.assert_allclose(score["Overall Acc: \t"], 0.75)

    def test_update_div_mimo_batch_major(self):
        rs = runningScore(2)
        # B=1, N=2: agent0 normal, agent1 noisy; labels stacked batch-major
        commun = np.array([[[0, 1], [0, 0]]])  # (1, 2, 2): noise flags, links
        gt = np.array([[[0]], [[1]]])  # (B*N, 1, 1)
        pred = np.array([[[0]], [[0]]])
        rs.update_div("mimo", gt, pred, commun)
        assert rs.confusion_matrix_pos.sum() == 1  # agent0 pixel
        assert rs.confusion_matrix_neg.sum() == 1  # agent1 pixel
        assert rs.confusion_matrix_pos[0, 0] == 1
        assert rs.confusion_matrix_neg[1, 0] == 1

    def test_selection_mimo_golden(self):
        rs = runningScore(11)
        # B=1, N=3. agent0 normal, agents 1,2 noisy with links to 0
        commun = np.array([[[0, 1, 1], [2, 0, 0]]])  # noise, link
        # gt_action = link*noise + id*(1-noise) = [0, 0, 0]
        action = np.array([[0, 0, 2]])  # agent2 wrongly keeps itself
        rs.update_selection("mimo", commun, action)
        assert rs.total_agent == 3
        # when: pred = action != id -> [F, T, F]; label bool = [F, T, T] -> 2 match
        assert rs.correct_when2com == 2
        # who: action == gt_action -> [T, T, F] -> 2
        assert rs.correct_who2com == 2
        when, who = rs.get_selection_accuracy()
        np.testing.assert_allclose(when, 200 / 3)
        np.testing.assert_allclose(who, 200 / 3)

    def test_selection_when2com_1d(self):
        rs = runningScore(11)
        label = np.array([-1, 0, 2])  # +1 -> [0, 1, 3]
        action = np.array([0, 1, 2])
        rs.update_selection("when2com", label, action)
        assert rs.total_agent == 3
        # when: pred = action==0 -> [T,F,F]; label==0 -> [T,F,F] -> 3 correct
        assert rs.correct_when2com == 3
        # who: action == shifted label -> [T, T, F] -> 2
        assert rs.correct_who2com == 2

    def test_selection_when2com_2d_activated(self):
        rs = runningScore(11)
        label = np.array([-1, 1])  # +1 -> [0, 2]
        action = np.array([
            [0.9, 0.0, 0.1, 0.0, 0.0],   # only self active
            [0.3, 0.0, 0.5, 0.0, 0.0],   # self + gt link 2 active
        ])
        rs.update_selection("when2com", label, action)
        # who: sample0 link[0]=0.9>0.2 at label 0 -> +1; sample1 link[2] -> +1
        assert rs.correct_who2com == 2
        # when: pred=any non-self link -> [F, T]; label==0 -> [T, F]
        # (reference compares them directly, metrics.py:45) -> 0 correct
        assert rs.correct_when2com == 0

    def test_bandwidth_meter(self):
        rs = runningScore(2)
        rs.update_bandW(1.0)
        rs.update_bandW(2.0)
        assert rs.get_avg_bandW() == 1.5

    def test_device_hist_path_equals_numpy(self, rng):
        from multiagentperception_tpu.ops import confusion_matrix

        gt = rng.integers(0, 5, size=(3, 16))
        pred = rng.integers(0, 5, size=(3, 16))
        a = runningScore(5)
        a.update(gt, pred)
        b = runningScore(5)
        b.update_hist(np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 5)))
        np.testing.assert_array_equal(a.confusion_matrix, b.confusion_matrix)


class TestSchedulers:
    def test_default_constant(self):
        s = get_scheduler(None, 1e-5)
        assert float(s(0)) == pytest.approx(1e-5)
        assert float(s(10 ** 6)) == pytest.approx(1e-5)

    def test_multi_step(self):
        s = get_scheduler({"name": "multi_step", "milestones": [10], "gamma": 0.1}, 1.0)
        assert float(s(5)) == pytest.approx(1.0)
        assert float(s(15)) == pytest.approx(0.1)

    def test_warmup(self):
        s = get_scheduler(
            {"name": "constant_lr", "warmup_iters": 10, "warmup_factor": 0.5}, 1.0
        )
        assert float(s(0)) == pytest.approx(0.5)
        assert float(s(20)) == pytest.approx(1.0)


class TestAverageMeter:
    def test_running_average(self):
        m = averageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0


class TestASGD:
    def test_matches_torch_asgd(self, rng):
        """Our asgd registry entry replicates torch.optim.ASGD's parameter
        trajectory (eta decay + lambd decay; reference registry
        /root/reference/ptsemseg/optimizers/__init__.py:9). A large lambd
        makes the per-step eta decay visible within a few steps."""
        import torch

        from multiagentperception_tpu.optimizers import get_optimizer

        lr, lambd, wd = 0.05, 0.3, 0.01
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

        p = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.ASGD([p], lr=lr, lambd=lambd, weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            p.grad = torch.tensor(g)
            opt.step()
        torch_w = p.detach().numpy()

        cfg = normalize_config(
            {"training": {"optimizer": {
                "name": "asgd", "lr": lr, "lambd": lambd,
                "weight_decay": wd}}}
        )
        tx = get_optimizer(cfg)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = {"w": params["w"] + updates["w"]}
        np.testing.assert_allclose(np.asarray(params["w"]), torch_w,
                                   rtol=1e-5, atol=1e-6)
        # averaging inactive below t0: ax tracks p exactly (torch stores but
        # never loads ax; our state mirrors that)
        np.testing.assert_allclose(np.asarray(state.ax["w"]),
                                   np.asarray(params["w"]), rtol=1e-6)


class TestHangDebug:
    def test_sigusr1_dumps_stacks_without_dying(self):
        """enable_hang_debug registers a faulthandler on SIGUSR1: the process
        dumps every thread's stack to stderr and keeps running (the hung-run
        diagnosis path for stalled device RPCs on tunneled hosts)."""
        import subprocess
        import sys

        code = (
            "from multiagentperception_tpu.utils import enable_hang_debug\n"
            "import os, signal, time\n"
            "enable_hang_debug()\n"
            "os.kill(os.getpid(), signal.SIGUSR1)\n"
            "time.sleep(0.2)\n"
            "print('alive')\n"
        )
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=60)
        assert res.returncode == 0, res.stderr
        assert "alive" in res.stdout
        assert "Current thread" in res.stderr  # faulthandler stack header


class TestHostRss:
    def test_reads_positive_rss(self):
        """host_rss_gb: a running CPython interpreter resides in at least a
        few MB; the /proc reader must see it (fast path of the
        training.rss_limit_gb restart guard)."""
        from multiagentperception_tpu.utils import host_rss_gb

        rss = host_rss_gb()
        assert rss > 0.005  # > 5 MB
        assert rss < 1024.0  # sane upper bound
