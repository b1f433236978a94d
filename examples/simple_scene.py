"""Refine a single object pose on the bundled example scene.

TPU-native port of the reference example (reference examples/simple_scene.py):

    python examples/simple_scene.py [key.sub=value ...]

Hydra-style dotted overrides are accepted directly on the command line, e.g.

    python examples/simple_scene.py hyperparameters.nb_iterations=30 \
        scene.image_resize=0.25 tpu.optimizer=adam
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2  # noqa: E402

import diffdope_tpu as dd  # noqa: E402
from diffdope_tpu.config import cli_overrides  # noqa: E402


def main():
    cfg = dd.load_config(overrides=cli_overrides(sys.argv[1:]))

    ddope = dd.DiffDope(cfg=cfg)
    ddope.run_optimization()

    print("argmin:", ddope.get_argmin())
    print("pose (OpenGL frame):\n", ddope.get_pose())
    print("pose (OpenCV/BOP frame):\n", ddope.get_pose_opencv())
    print("run stats:", ddope.last_run_stats)

    img_plot = ddope.plot_losses()
    if img_plot is not None:
        cv2.imwrite("plot.png", img_plot)
        print("saved loss plot to plot.png")

    overlay = ddope.render_img()
    cv2.imwrite("overlay.png", overlay)
    print("saved final overlay to overlay.png")

    if cfg.get_dotted("render_images.make_animation", True):
        ddope.make_animation(output_file_path="simple_scene.mp4")
        print("saved animation to simple_scene.mp4")


if __name__ == "__main__":
    main()
