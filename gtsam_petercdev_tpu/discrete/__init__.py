"""gtsam_petercdev_tpu.discrete"""
