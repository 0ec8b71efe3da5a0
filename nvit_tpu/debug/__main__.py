from nvit_tpu.debug.cli import debug_model

if __name__ == "__main__":
    debug_model()
