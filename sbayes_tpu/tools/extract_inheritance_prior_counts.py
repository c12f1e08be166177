"""Name-parity wrapper: see sbayes_tpu.tools.extract_prior_counts."""
from sbayes_tpu.tools.extract_prior_counts import main_inheritance as main

if __name__ == "__main__":
    main()
