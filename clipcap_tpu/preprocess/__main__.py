from clipcap_tpu.preprocess.preprocess import start_preprocess

if __name__ == "__main__":
    exit(start_preprocess())
