"""gtsam_petercdev_tpu.navigation"""
