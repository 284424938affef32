"""gtsam_petercdev_tpu.slam"""
