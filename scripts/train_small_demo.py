"""Train the GNN on the small generated dataset (demo-scale run)."""
import sys

from dyn_res_pile_manip_tpu.train.train_gnn_dyn import train
from dyn_res_pile_manip_tpu.utils.config import load_config


def main():
    n_epi = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cfg = load_config(overrides={
        "dataset": {"n_episode": n_epi, "n_timestep": 10,
                    "init_pos": "center", "obj": "carrots"},
        "train": {"data_root": "data/gnn_dyn_data_small",
                  "n_epoch": n_epoch, "batch_size": 4,
                  "train_valid_ratio": 0.9, "log_per_iter": 10,
                  "ckp_per_iter": 1000,
                  "particle": {"resume": {"active": False, "epoch": 0,
                                          "iter": 0, "folder": "demo"},
                               "nf_effect": 64, "adj_thresh": 0.08,
                               "add_delta": False}},
    })
    # fixed run dir so the demo can find the checkpoint (patch the symbol
    # train_gnn_dyn actually calls, not the defining module's)
    import dyn_res_pile_manip_tpu.train.train_gnn_dyn as tgd
    tgd.timestamp_dir_name = lambda: "demo"
    train(cfg)


if __name__ == "__main__":
    main()
