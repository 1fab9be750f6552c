"""Generate the ten shipped experiment configs (same schema/values as the
reference's configs/, SURVEY.md §L0) under configs/, plus the framework's
extension configs under configs/extensions/ (no reference counterpart)."""

import os

import yaml

BASE_TRAINING = {
    "train_iters": 200000,
    "batch_size": 2,
    "val_interval": 1000,
    "n_workers": 8,
    "print_interval": 50,
    "optimizer": {"name": "adam", "lr": 1.0e-5},
    "loss": {"name": "cross_entropy", "size_average": True},
    "lr_schedule": None,
    "resume": None,
}


def data(path, target_view, commun_label=None):
    d = {
        "dataset": "airsim",
        "train_split": "train",
        "val_split": "val",
        "test_split": "test",
        "img_rows": 512,
        "img_cols": 512,
        "path": path,
        "noisy_type": "None",
        "target_view": target_view,
    }
    if commun_label is not None:
        d["commun_label"] = commun_label
    return d


def baseline_model(arch, agent_num, shuffle=None, multiple_output=False):
    return {
        "arch": arch,
        "shuffle_features": shuffle if shuffle else "None",
        "agent_num": agent_num,
        "enc_backbone": "resnet_encoder",
        "dec_backbone": "simple_decoder",
        "feat_squeezer": -1,
        "feat_channel": 512,
        "multiple_output": multiple_output,
    }


def comm_model(arch, agent_num, query_size, shared="unified", query=True,
               multiple_output=False):
    return {
        "arch": arch,
        "agent_num": agent_num,
        "shared_policy": True,
        "shared_img_encoder": shared,
        "attention": "general",
        "sparse": False,
        "query": query,
        "query_size": query_size,
        "key_size": 1024,
        "enc_backbone": "resnet_encoder",
        "dec_backbone": "simple_decoder",
        "feat_squeezer": -1,
        "feat_channel": 512,
        "multiple_output": multiple_output,
    }


SRMS = "dataset/airsim-srms-data"
SRMS_NOISE = "dataset/airsim-srms-noise-data"
MRMS = "dataset/airsim-mrms-data"
MRMS_NOISE = "dataset/airsim-mrms-noise-data"

CONFIGS = {
    "single-request-multiple-support/srms_allnorm.yml": {
        "model": baseline_model("Single_agent", 5),
        "data": data(SRMS, "target", "None"),
        "training": BASE_TRAINING,
    },
    "single-request-multiple-support/srms_occdeg.yml": {
        "model": baseline_model("Single_agent", 5),
        "data": data(SRMS_NOISE, "target", "None"),
        "training": BASE_TRAINING,
    },
    "single-request-multiple-support/srms_randcom.yml": {
        "model": baseline_model("All_agents", 5, shuffle="selection"),
        "data": data(SRMS_NOISE, "target", "when2com"),
        "training": BASE_TRAINING,
    },
    "single-request-multiple-support/srms_when2com.yml": {
        "model": comm_model("LearnWhen2Com", 5, query_size=8),
        "data": data(SRMS_NOISE, "target", "when2com"),
        "training": BASE_TRAINING,
    },
    "single-request-multiple-support/srms_who2com.yml": {
        "model": comm_model("LearnWho2Com", 5, query_size=8,
                            shared="only_normal_agents"),
        "data": data(SRMS_NOISE, "target", "when2com"),
        "training": BASE_TRAINING,
    },
    "multi-request-multi-support/mrms_allnorm.yml": {
        "model": baseline_model("Single_agent", 6, multiple_output=True),
        "data": data(MRMS, "6agent"),
        "training": {**BASE_TRAINING, "train_iters": 12, "val_interval": 6,
                     "n_workers": 4, "print_interval": 2},
    },
    "multi-request-multi-support/mrms_occdeg.yml": {
        "model": baseline_model("Single_agent", 6, multiple_output=True),
        "data": data(MRMS_NOISE, "6agent"),
        "training": {**BASE_TRAINING, "n_workers": 4},
    },
    "multi-request-multi-support/mrms_randcom.yml": {
        "model": baseline_model("MIMO_All_agents", 6, shuffle="selection",
                                multiple_output=True),
        "data": data(MRMS_NOISE, "6agent", "mimo"),
        "training": {**BASE_TRAINING, "batch_size": 1, "n_workers": 4},
    },
    "multi-request-multi-support/mrms_when2com.yml": {
        "model": comm_model("MIMOcom", 6, query_size=32, multiple_output=True),
        "data": data(MRMS_NOISE, "6agent", "mimo"),
        "training": BASE_TRAINING,
    },
    "multi-request-multi-support/mrms_who2com.yml": {
        "model": comm_model("MIMOcomWho", 6, query_size=32, query=False,
                            multiple_output=True),
        "data": data(MRMS_NOISE, "6agent", "mimo"),
        "training": BASE_TRAINING,
    },
    # --- framework extensions (not in the reference) ---------------------
    # bandwidth-constrained when2com: the comm graph is pruned to the top-k
    # strongest links per requester at evaluation (BASELINE.json configs[4];
    # tradeoff curve in BASELINE.md)
    "extensions/mrms_when2com_topk.yml": {
        "model": {**comm_model("MIMOcom", 6, query_size=32,
                               multiple_output=True),
                  "topk_k": 2, "eval_inference": "topk"},
        "data": data(MRMS_NOISE, "6agent", "mimo"),
        "training": BASE_TRAINING,
    },
}


def main(out_root="configs"):
    for rel, cfg in CONFIGS.items():
        path = os.path.join(out_root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        print("wrote", path)


if __name__ == "__main__":
    main()
