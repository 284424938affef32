"""gtsam_petercdev_tpu.geometry"""
