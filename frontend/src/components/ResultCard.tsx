"use client";

import { Download, Loader2 } from "lucide-react";
import type { ModelName } from "@/lib/api";

export type CardState =
  | { kind: "idle" }
  | { kind: "running" }
  | { kind: "error"; message: string }
  | { kind: "done"; outputB64?: string; graphB64?: string; backend?: string };

function B64Image({
  b64,
  alt,
  downloadName,
}: {
  b64: string;
  alt: string;
  downloadName: string;
}) {
  const href = `data:image/png;base64,${b64}`;
  return (
    <div className="space-y-1">
      {/* eslint-disable-next-line @next/next/no-img-element */}
      <img src={href} alt={alt} className="w-full rounded-xl bg-slate-900" />
      <a
        href={href}
        download={downloadName}
        className="inline-flex items-center gap-1 text-xs text-sky-400 hover:underline"
      >
        <Download className="h-3 w-3" /> download {alt}
      </a>
    </div>
  );
}

export default function ResultCard({
  model,
  state,
}: {
  model: ModelName;
  state: CardState;
}) {
  return (
    <div className="rounded-2xl border border-slate-800 bg-slate-900/60 p-4">
      <div className="mb-2 flex items-center justify-between">
        <h3 className="text-sm font-semibold uppercase tracking-wide">
          {model}
        </h3>
        {state.kind === "idle" && (
          <span className="text-xs text-slate-500">idle</span>
        )}
        {state.kind === "running" && (
          <span className="inline-flex items-center gap-1 text-xs text-sky-400">
            <Loader2 className="h-3 w-3 animate-spin" /> running
          </span>
        )}
        {state.kind === "error" && (
          <span className="text-xs text-red-400">{state.message}</span>
        )}
        {state.kind === "done" && (
          <span className="text-xs text-emerald-400">
            done{state.backend ? ` (${state.backend})` : ""}
          </span>
        )}
      </div>
      {state.kind === "done" && (
        <div className="space-y-3">
          {state.outputB64 && (
            <B64Image
              b64={state.outputB64}
              alt="output"
              downloadName={`${model}_output.png`}
            />
          )}
          {state.graphB64 && (
            <B64Image
              b64={state.graphB64}
              alt="analysis"
              downloadName={`${model}_analysis.png`}
            />
          )}
        </div>
      )}
    </div>
  );
}
