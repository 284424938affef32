"""gtsam_petercdev_tpu.parallel"""
