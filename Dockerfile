# microvllm_tpu serving image (TPU VM host).
# Build:  docker build -t microvllm-tpu .
# Run:    docker run --privileged --net=host microvllm-tpu \
#             --model /models/Qwen2.5-7B-Instruct --bits 4 --port 8000
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY microvllm_tpu ./microvllm_tpu
COPY native ./native
COPY benchmark_serving.py bench.py ./
COPY tools ./tools

# jax[tpu] pulls libtpu for TPU VMs; hf extra enables checkpoint loading
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir ".[hf]" \
    && sh native/build.sh

EXPOSE 8000
ENTRYPOINT ["python", "-m", "microvllm_tpu.server.api"]
CMD ["--model", "qwen2.5-7b", "--bits", "4", "--port", "8000"]
