"use client";

import { useCallback, useRef, useState } from "react";
import { ImagePlus } from "lucide-react";
import { MAX_UPLOAD_BYTES } from "@/lib/api";

export default function UploadZone({
  file,
  onFile,
}: {
  file: File | null;
  onFile: (f: File) => void;
}) {
  const inputRef = useRef<HTMLInputElement>(null);
  const [dragging, setDragging] = useState(false);
  const [preview, setPreview] = useState<string | null>(null);
  const [error, setError] = useState<string | null>(null);

  const accept = useCallback(
    (f: File | undefined) => {
      if (!f) return;
      if (f.size > MAX_UPLOAD_BYTES) {
        setError("File too large — the API caps uploads at 50 MB.");
        return;
      }
      setError(null);
      onFile(f);
      const reader = new FileReader();
      reader.onload = () => setPreview(reader.result as string);
      reader.readAsDataURL(f);
    },
    [onFile],
  );

  return (
    <div
      className={`cursor-pointer rounded-2xl border-2 border-dashed p-10 text-center transition
        ${dragging ? "border-sky-400 bg-sky-400/5" : "border-slate-700"}`}
      onClick={() => inputRef.current?.click()}
      onDragOver={(e) => {
        e.preventDefault();
        setDragging(true);
      }}
      onDragLeave={() => setDragging(false)}
      onDrop={(e) => {
        e.preventDefault();
        setDragging(false);
        accept(e.dataTransfer.files?.[0]);
      }}
    >
      <ImagePlus className="mx-auto mb-3 h-8 w-8 text-sky-400" />
      <p className="font-medium">
        Drop an image here or click to choose
      </p>
      <p className="mt-1 text-sm text-slate-400">
        PNG / JPEG, up to 50&nbsp;MB
      </p>
      {file && <p className="mt-2 text-sm text-slate-300">{file.name}</p>}
      {error && <p className="mt-2 text-sm text-red-400">{error}</p>}
      {preview && (
        // eslint-disable-next-line @next/next/no-img-element
        <img
          src={preview}
          alt="preview"
          className="mx-auto mt-4 max-h-48 rounded-xl"
        />
      )}
      <input
        ref={inputRef}
        type="file"
        accept="image/*"
        className="hidden"
        onChange={(e) => accept(e.target.files?.[0] ?? undefined)}
      />
    </div>
  );
}
