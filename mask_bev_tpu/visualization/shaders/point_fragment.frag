#version 330 core
// render mode 0: intensity grayscale; 1: per-point label color

in float frag_intensity;
in vec3 frag_color;
out vec4 out_color;

uniform float u_render_mode;

void main()
{
    vec3 gray = vec3(0.15 + 0.85 * clamp(frag_intensity, 0.0, 1.0));
    out_color = vec4(mix(gray, frag_color, step(0.5, u_render_mode)), 1.0);
}
