"""gtsam_petercdev_tpu.linear"""
