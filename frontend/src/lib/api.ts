// API client for the unified GAN backend.
// Contract: POST /enhance?model=... (multipart: file [+label] [+cond_file])
// → { denoised_image_base64 | output_image_base64,
//     noise_graph_base64 | analysis_graph_base64, backend }.

export const API_BASE =
  process.env.NEXT_PUBLIC_API_BASE ?? "http://localhost:8000";

export const MODELS = ["denoise", "cgan", "srgan", "esrgan"] as const;
export type ModelName = (typeof MODELS)[number];

export const MAX_UPLOAD_BYTES = 50 * 1024 * 1024;

export interface EnhanceResult {
  outputB64?: string;
  graphB64?: string;
  backend?: string;
}

export async function enhance(
  model: ModelName,
  file: File,
  opts: { label?: number; condFile?: File } = {},
): Promise<EnhanceResult> {
  const form = new FormData();
  form.append("file", file);
  const params = new URLSearchParams({ model });
  if (model === "cgan") {
    // the served cGAN is the Keras-architecture model; a default label
    // keeps the torch fallback path usable too
    form.append("label", String(opts.label ?? 5));
    params.set("cgan_backend", "keras");
    if (opts.condFile) form.append("cond_file", opts.condFile);
  }
  const res = await fetch(`${API_BASE}/enhance?${params}`, {
    method: "POST",
    body: form,
  });
  const data = await res.json().catch(() => ({}));
  if (!res.ok) {
    throw new Error(data?.detail ?? `HTTP ${res.status}`);
  }
  return {
    outputB64: data.denoised_image_base64 ?? data.output_image_base64,
    graphB64: data.noise_graph_base64 ?? data.analysis_graph_base64,
    backend: data.backend,
  };
}
