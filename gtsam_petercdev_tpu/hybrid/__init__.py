"""gtsam_petercdev_tpu.hybrid"""
