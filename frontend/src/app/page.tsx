"use client";

// Home page: upload an image, pick a model (or run all four sequentially),
// view/download the enhanced output and the noise-analysis figure.
// Capability-parity port of the reference UI; the full-pipeline run stays
// strictly sequential so a single accelerator serves one request at a time.

import { useCallback, useState } from "react";
import { Play, Rows4 } from "lucide-react";
import UploadZone from "@/components/UploadZone";
import ResultCard, { type CardState } from "@/components/ResultCard";
import { enhance, MODELS, type ModelName } from "@/lib/api";

export default function HomePage() {
  const [file, setFile] = useState<File | null>(null);
  // cGAN conditioning: optional condition image + class label
  // (reference page.tsx appends label "5" and an optional cond_file)
  const [condFile, setCondFile] = useState<File | undefined>(undefined);
  const [label, setLabel] = useState("5");
  const [active, setActive] = useState<ModelName>("denoise");
  const [busy, setBusy] = useState(false);
  const [cards, setCards] = useState<Record<ModelName, CardState>>(
    () =>
      Object.fromEntries(MODELS.map((m) => [m, { kind: "idle" }])) as Record<
        ModelName,
        CardState
      >,
  );

  const setCard = useCallback((m: ModelName, s: CardState) => {
    setCards((prev) => ({ ...prev, [m]: s }));
  }, []);

  const runOne = useCallback(
    async (m: ModelName) => {
      if (!file) return;
      setCard(m, { kind: "running" });
      try {
        // coerce at submit time (not per keystroke, which would fight the
        // user's editing); blank/invalid falls back to the reference's 5
        const n = Number(label);
        const lbl = label !== "" && Number.isFinite(n) ? n : 5;
        const r = await enhance(m, file, { label: lbl, condFile });
        setCard(m, { kind: "done", ...r });
      } catch (err) {
        setCard(m, {
          kind: "error",
          message: err instanceof Error ? err.message : "failed",
        });
      }
    },
    [file, condFile, label, setCard],
  );

  const runAll = useCallback(async () => {
    if (!file) return;
    setBusy(true);
    setCards(
      Object.fromEntries(MODELS.map((m) => [m, { kind: "idle" }])) as Record<
        ModelName,
        CardState
      >,
    );
    for (const m of MODELS) {
      // sequential on purpose: one accelerator, one request at a time
      // eslint-disable-next-line no-await-in-loop
      await runOne(m);
    }
    setBusy(false);
  }, [file, runOne]);

  return (
    <main className="mx-auto max-w-5xl px-6 py-10">
      <header className="mb-8">
        <h1 className="text-2xl font-bold">
          Celebrity Image <span className="text-sky-400">Denoiser</span>
        </h1>
        <p className="mt-1 text-sm text-slate-400">
          denoise · cGAN · SRGAN · ESRGAN — unified enhancement API on TPU
        </p>
      </header>

      <UploadZone file={file} onFile={setFile} />

      <div className="mt-6 flex flex-wrap gap-2">
        {MODELS.map((m) => (
          <button
            key={m}
            onClick={() => setActive(m)}
            className={`rounded-lg border px-4 py-2 text-sm uppercase tracking-wide transition
              ${
                active === m
                  ? "border-sky-400 text-sky-400"
                  : "border-slate-800 bg-slate-900/60 text-slate-300"
              }`}
          >
            {m}
          </button>
        ))}
      </div>

      {active === "cgan" && (
        <div className="mt-4 flex flex-wrap items-center gap-4 rounded-lg border border-slate-800 bg-slate-900/60 p-4 text-sm">
          <label className="flex items-center gap-2">
            <span className="text-slate-400">Class label</span>
            <input
              type="number"
              min={0}
              max={9}
              value={label}
              onChange={(e) => setLabel(e.target.value)}
              className="w-16 rounded border border-slate-700 bg-slate-950 px-2 py-1"
            />
          </label>
          <label className="flex items-center gap-2">
            <span className="text-slate-400">Condition image (optional)</span>
            <input
              type="file"
              accept="image/*"
              onChange={(e) => setCondFile(e.target.files?.[0] ?? undefined)}
              className="text-slate-300 file:mr-2 file:rounded file:border-0 file:bg-slate-800 file:px-3 file:py-1 file:text-slate-200"
            />
          </label>
          {condFile && (
            <button
              onClick={() => setCondFile(undefined)}
              className="rounded border border-slate-700 px-2 py-1 text-xs text-slate-400"
            >
              clear
            </button>
          )}
        </div>
      )}

      <div className="mt-4 flex gap-3">
        <button
          disabled={!file || busy}
          onClick={() => runOne(active)}
          className="inline-flex items-center gap-2 rounded-lg bg-sky-400 px-5 py-2.5 font-semibold text-slate-950 disabled:opacity-40"
        >
          <Play className="h-4 w-4" /> Run {active.toUpperCase()}
        </button>
        <button
          disabled={!file || busy}
          onClick={runAll}
          className="inline-flex items-center gap-2 rounded-lg border border-slate-700 px-5 py-2.5 font-semibold disabled:opacity-40"
        >
          <Rows4 className="h-4 w-4" /> Run Full Pipeline
        </button>
      </div>

      <div className="mt-8 grid gap-4 md:grid-cols-2">
        {MODELS.map((m) => (
          <ResultCard key={m} model={m} state={cards[m]} />
        ))}
      </div>
    </main>
  );
}
