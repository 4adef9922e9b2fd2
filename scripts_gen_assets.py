"""Pre-generate goal-shape assets (assets/target_shapes/helvetica_*.npy) and
warm-start action sequences (assets/init_action_{n}.npy), the counterparts
of the reference's shipped env/target_shapes + init_action data."""
import numpy as np

from dyn_res_pile_manip_tpu.utils.imaging import save_goal_assets


def main():
    save_goal_assets("assets/target_shapes", 720, 720)
    rng = np.random.default_rng(42)
    for n in (10, 20, 50, 100):
        acts = rng.uniform(-5.0, 5.0, (n, 4))
        np.save(f"assets/init_action_{n}.npy", acts)
    print("assets written")


if __name__ == "__main__":
    main()
