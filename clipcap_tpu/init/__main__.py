from clipcap_tpu.init.base import init

if __name__ == "__main__":
    exit(init())
