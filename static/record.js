// Web client logic (capability parity with reference static/record.js):
// file upload to /recognition[_long_audio] and microphone streaming over the
// WebSocket endpoint as 16 kHz 16-bit mono PCM chunks, b'end' sentinel.

const HTTP_BASE = location.origin;
const WS_URL = `ws://${location.hostname}:5001`;

async function uploadFile(isLong) {
  const input = document.getElementById('audio_file');
  if (!input.files.length) { alert('请选择音频文件'); return; }
  const endpoint = isLong ? '/recognition_long_audio' : '/recognition';
  const resp = await fetch(HTTP_BASE + endpoint, {
    method: 'POST',
    body: await input.files[0].arrayBuffer(),
  });
  const data = await resp.json();
  document.getElementById('result').innerText =
    data.code === 0 ? `结果: ${data.result} (score ${data.score})`
                    : `错误: ${data.msg}`;
}

let ws = null, audioCtx = null, processor = null, source = null,
    stream = null, recording = false;

function floatTo16BitPCM(float32) {
  const out = new Int16Array(float32.length);
  for (let i = 0; i < float32.length; i++) {
    const s = Math.max(-1, Math.min(1, float32[i]));
    out[i] = s < 0 ? s * 0x8000 : s * 0x7FFF;
  }
  return out;
}

function downsampleTo16k(buffer, fromRate) {
  if (fromRate === 16000) return buffer;
  const ratio = fromRate / 16000;
  const length = Math.floor(buffer.length / ratio);
  const out = new Float32Array(length);
  for (let i = 0; i < length; i++) out[i] = buffer[Math.floor(i * ratio)];
  return out;
}

function setRecUI(btn, on) {
  // icon + class swap (record.png idle / recording.gif pulsing)
  const icon = document.getElementById('rec_icon');
  if (icon) icon.src = on ? '/static/recording.gif' : '/static/record.png';
  btn.classList.toggle('recording', on);
  for (const node of btn.childNodes) {
    if (node.nodeType === Node.TEXT_NODE && node.textContent.trim()) {
      node.textContent = on ? '停止录音' : '开始录音';
      return;
    }
  }
  btn.appendChild(document.createTextNode(on ? '停止录音' : '开始录音'));
}

async function toggleRecord() {
  const btn = document.getElementById('rec_btn');
  if (recording) {
    recording = false;
    setRecUI(btn, false);
    if (ws && ws.readyState === WebSocket.OPEN) ws.send('end');
    if (processor) processor.disconnect();
    if (source) source.disconnect();
    if (stream) stream.getTracks().forEach(t => t.stop());
    return;
  }
  stream = await navigator.mediaDevices.getUserMedia({audio: true});
  audioCtx = new AudioContext();
  source = audioCtx.createMediaStreamSource(stream);
  processor = audioCtx.createScriptProcessor(8192, 1, 1);
  ws = new WebSocket(WS_URL);
  ws.onmessage = (ev) => {
    const data = JSON.parse(ev.data);
    document.getElementById('stream_result').innerText = data.result || '';
  };
  ws.onopen = () => {
    processor.onaudioprocess = (e) => {
      if (!recording || ws.readyState !== WebSocket.OPEN) return;
      const mono = downsampleTo16k(e.inputBuffer.getChannelData(0),
                                   audioCtx.sampleRate);
      ws.send(floatTo16BitPCM(mono).buffer);
    };
    source.connect(processor);
    processor.connect(audioCtx.destination);
    recording = true;
    setRecUI(btn, true);
  };
}
