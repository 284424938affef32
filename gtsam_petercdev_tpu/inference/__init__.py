"""gtsam_petercdev_tpu.inference"""
